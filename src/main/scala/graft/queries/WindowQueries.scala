package graft.queries

import graft.{Canon, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function family: ranking, analytic (lag/lead/first/last), frame
  * specs (rows / range / unbounded), top-K per group (SURVEY.md §2.B).
  *
  * Each query partitions by its natural key so at scale the sort is per-key
  * within a shuffle partition — no global sort. Window sums run over exact
  * decimal so frame evaluation order can't perturb the oracle hash.
  */
object WindowQueries {
  import Canon._

  private def eventsWithSec(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_timestamp(col("ts")).as("ts_s"))

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_win_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn, rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
             ORDER BY o_custkey, o_orderkey""")),

    GQuery(
      "q_win_dist",
      (s, dir) => {
        // Distribution + positional window functions: percent_rank /
        // cume_dist (relative standing inside the key group — the
        // percentile machinery quality-threshold filters use) and
        // first_value / nth_value over the default running frame. Total
        // ordering (price, then key) keeps frame contents identical across
        // engines; ratios take the r4 contract.
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .select(
            col("o_custkey"), col("o_orderkey"),
            r4(percent_rank().over(w)).as("prk"),
            r4(cume_dist().over(w)).as("cd"),
            first(col("o_orderkey")).over(w).as("first_ok"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             round(percent_rank() OVER w, 4) AS prk,
             round(cume_dist() OVER w, 4) AS cd,
             first_value(o_orderkey) OVER w AS first_ok,
             nth_value(o_orderkey, 2) OVER w AS second_ok
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
             ORDER BY o_custkey, o_orderkey""")),

    GQuery(
      "q_win_lag",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
        eventsWithSec(s, dir)
          .select(
            col("event_id"), col("user_id"),
            r4(col("value") - lag(col("value"), 1).over(w)).as("delta"),
            (lead(col("ts_s"), 1).over(w) - col("ts_s")).as("gap_s"),
            first(col("event_id")).over(w).as("first_id"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, value,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
             SELECT event_id, user_id,
                    round(value - lag(value, 1) OVER w, 4) AS delta,
                    (lead(ts_s, 1) OVER w) - ts_s AS gap_s,
                    first_value(event_id) OVER w AS first_id
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
             ORDER BY event_id""")),

    GQuery(
      "q_win_frames",
      (s, dir) => {
        val base = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
        val dv = col("value").cast(DecimalType(28, 4))
        val byTs = Window.partitionBy("user_id").orderBy(col("ts_s"))
        eventsWithSec(s, dir)
          .select(
            col("event_id"), col("user_id"),
            r4(sum(dv).over(base.rowsBetween(-2, 0)).cast("double")).as("mov3"),
            r4(sum(dv).over(base.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
              .as("runsum"),
            r4(sum(dv).over(byTs.rangeBetween(-600, 0)).cast("double")).as("sum10m"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, value,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
             SELECT event_id, user_id,
                    round(CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (
                      PARTITION BY user_id ORDER BY ts_s, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS mov3,
                    round(CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (
                      PARTITION BY user_id ORDER BY ts_s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS runsum,
                    round(CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (
                      PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS sum10m
             FROM e ORDER BY event_id""")),

    GQuery(
      "q_win_gaps",
      (s, dir) => {
        // Gaps-and-islands sessionization — the batch dual of
        // q_stream_session's session_window: a new island starts where the
        // gap to the previous event exceeds 10 minutes; the island id is the
        // running count of starts. One shuffle on user_id serves both
        // windows and the final rollup (same-key partitioning reused), so
        // at 100 TB each user's timeline sorts inside its own partition —
        // no global sort, no self-join.
        val w = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
        eventsWithSec(s, dir)
          .withColumn("prev_s", lag(col("ts_s"), 1).over(w))
          .withColumn("new_s",
            when(col("prev_s").isNull || col("ts_s") - col("prev_s") > 600, 1L)
              .otherwise(0L))
          .withColumn("island",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "island")
          .agg(
            count(lit(1)).as("n"),
            min("ts_s").as("start_s"),
            max("ts_s").as("end_s"))
          .withColumn("dur_s", col("end_s") - col("start_s"))
          .orderBy("user_id", "island")
      },
      Some("""WITH e AS (SELECT user_id, event_id,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
              d AS (SELECT *, CASE WHEN lag(ts_s) OVER w IS NULL
                      OR ts_s - lag(ts_s) OVER w > 600 THEN 1 ELSE 0 END AS new_s
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
              i AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                      ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
                    FROM d)
              SELECT user_id, island, count(*) AS n,
                min(ts_s) AS start_s, max(ts_s) AS end_s,
                max(ts_s) - min(ts_s) AS dur_s
              FROM i GROUP BY user_id, island ORDER BY user_id, island""")),

    GQuery(
      "q_win_topk",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), r4(col("o_totalprice")).as("price"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, price FROM (
               SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders)
             WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    GQuery(
      "q_win_topk_native",
      (s, dir) => {
        // Same answer as q_win_topk through the custom two-phase operator
        // (graft.plans.TopKPerKey): bounded heaps before the shuffle, so
        // only k rows per (key, map partition) move — vs the window form
        // shuffling and sorting every row. Oracle stays the window SQL.
        graft.plans.TopKPerKey(
          Tables.orders(s, dir),
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          3)
          .select(col("o_custkey"), col("o_orderkey"),
            r4(col("o_totalprice")).as("price"))
          .orderBy(col("o_custkey"), col("price").desc, col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, price FROM (
               SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders)
             WHERE rn <= 3 ORDER BY o_custkey, price DESC, o_orderkey""")),

    GQuery(
      "q_win_topk_rule",
      (s, dir) => {
        // The user writes the ordinary window idiom (row_number <= k, rank
        // dropped); the graft.plans.TopKRewrite optimizer rule replaces the
        // whole Window with the two-phase TopKPerKey operator — same answer
        // (this oracle proves it through the hash gate), but the shuffle
        // carries k rows per (key, map partition) instead of the table, and
        // no per-key sort or rank projection ever runs. Plan shape asserted
        // in TopKRewriteSpec.
        graft.plans.TopKRewrite.ensure(s)
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            r4(col("o_totalprice")).as("price"))
          .orderBy(col("o_custkey"), col("price").desc, col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, price FROM (
               SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders)
             WHERE rn <= 3 ORDER BY o_custkey, price DESC, o_orderkey""")))
}
