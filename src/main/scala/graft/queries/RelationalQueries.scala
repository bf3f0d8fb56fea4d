package graft.queries

import graft.{Canon, Tables}
import graft.functions.KubeFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, projections, filters, and the join family (SURVEY.md §2.B).
  *
  * Scale notes: dimension sides (region/nation/customer/supplier/part) are
  * explicitly broadcast so the fact-table joins never shuffle the big side
  * by a dimension key; the events self-join keys on user_id (equi) so the
  * range predicate is a post-join filter on co-partitioned data, not a
  * nested-loop; the as-of join is the union-then-window form — one shuffle,
  * no row explosion — which is the shape that survives 100 TB.
  */
object RelationalQueries {
  import Canon._

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_scan_count",
      (s, dir) => {
        Tables.names
          .map(n => Tables.table(s, dir, n)
            .agg(count(lit(1)).as("n"))
            .select(lit(n).as("tbl"), col("n")))
          .reduce(_.unionByName(_))
          .orderBy("tbl")
      },
      Some(Tables.names
        .map(n => s"SELECT '$n' AS tbl, count(*) AS n FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"))),

    GQuery(
      "q_proj_net",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount), 4) AS net
             FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    GQuery(
      "q_filter_complex",
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(
            col("o_orderstatus").isin("F", "O") &&
              col("o_totalprice").between(1000, 100000) &&
              col("o_orderpriority").like("%URGENT") &&
              !(col("o_custkey") % 10 === 0) &&
              col("o_orderdate").isNotNull)
          .select(col("o_orderkey"), col("o_custkey"), r4(col("o_totalprice")).as("price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
             FROM orders
             WHERE o_orderstatus IN ('F','O')
               AND o_totalprice BETWEEN 1000 AND 100000
               AND o_orderpriority LIKE '%URGENT'
               AND NOT (o_custkey % 10 = 0)
               AND o_orderdate IS NOT NULL
             ORDER BY o_orderkey""")),

    GQuery(
      "q_filter_allowblock",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val allow = e
          .filter(KubeFunctions.shouldWatch(col("event_type"), Seq("error", "purchase"), Nil))
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .select(lit("allow").as("mode"), col("event_type"), col("n"))
        val block = e
          .filter(KubeFunctions.shouldWatch(col("event_type"), Nil, Seq("view", "click")))
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .select(lit("block").as("mode"), col("event_type"), col("n"))
        allow.unionByName(block).orderBy("mode", "event_type")
      },
      Some("""SELECT 'allow' AS mode, event_type, count(*) AS n FROM events
             WHERE lower(event_type) IN ('error','purchase') GROUP BY 2
             UNION ALL
             SELECT 'block' AS mode, event_type, count(*) AS n FROM events
             WHERE lower(event_type) NOT IN ('view','click') GROUP BY 2
             ORDER BY mode, event_type""")),

    GQuery(
      "q_join_inner",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(
            r4(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus,
              round(${sql.dsum6("l_extendedprice * (1 - l_discount)")}, 4) AS revenue,
              count(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_join_outer",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_join_full",
      (s, dir) => {
        val negCust = Tables.customer(s, dir)
          .filter(col("c_acctbal") < 0).select(col("c_custkey"))
        val bigOrders = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 300000)
          .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
        negCust
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_custkey").isNotNull.cast("int").as("is_neg_bal"),
            coalesce(col("n_big"), lit(0)).as("n_big"))
          .orderBy("custkey")
      },
      Some("""WITH neg AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
             big AS (SELECT o_custkey, count(*) AS n_big FROM orders
                     WHERE o_totalprice > 300000 GROUP BY 1)
             SELECT coalesce(c_custkey, o_custkey) AS custkey,
                    CAST(c_custkey IS NOT NULL AS INT) AS is_neg_bal,
                    coalesce(n_big, 0) AS n_big
             FROM neg FULL JOIN big ON c_custkey = o_custkey
             ORDER BY custkey""")),

    GQuery(
      "q_join_semi",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(
            Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             ORDER BY c_custkey""")),

    GQuery(
      "q_join_anti",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             ORDER BY c_custkey""")),

    GQuery(
      "q_join_cross",
      (s, dir) => {
        Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
          .select(col("r_name"), col("n_name"))
          .orderBy("r_name", "n_name")
      },
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name")),

    GQuery(
      "q_join_range",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("ts_s"))
        val e1 = e.toDF("e1_id", "user_id", "e1_ts")
        val e2 = e.toDF("e2_id", "e2_user", "e2_ts")
        e1.join(
            e2,
            col("user_id") === col("e2_user") &&
              col("e2_ts").between(col("e1_ts"), col("e1_ts") + 3600) &&
              col("e1_id") < col("e2_id"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
             SELECT e1.user_id, count(*) AS n_pairs
             FROM e e1 JOIN e e2
               ON e1.user_id = e2.user_id
              AND e2.ts_s BETWEEN e1.ts_s AND e1.ts_s + 3600
              AND e1.event_id < e2.event_id
             GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_join_asof",
      (s, dir) => {
        // As-of join, union-then-window form: tag purchases and views, sort
        // once per user, carry the latest view id forward. One shuffle, no
        // pair blow-up — the 100 TB-safe shape.
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "view"))
          .select(
            col("event_id"), col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("ts_s"),
            when(col("event_type") === "view", col("event_id")).as("vid"))
        val w = Window.partitionBy("user_id")
          .orderBy(
            col("ts_s"),
            when(col("event_type") === "view", 0).otherwise(1),
            col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("view_id", last(col("vid"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("view_id"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
               SELECT event_id, user_id, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                      CASE WHEN event_type = 'view' THEN event_id END AS vid
               FROM events WHERE event_type IN ('purchase','view')),
             m AS (
               SELECT *, last_value(vid IGNORE NULLS) OVER (
                 PARTITION BY user_id
                 ORDER BY ts_s, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id
               FROM ev)
             SELECT event_id, user_id, view_id FROM m
             WHERE event_type = 'purchase' ORDER BY event_id""")),

    GQuery(
      "q_join_merge",
      (s, dir) => {
        // Explicit sort-merge join (large-large): the merge hint suppresses
        // the broadcast that small SFs would otherwise pick, exercising the
        // shuffle-sort-merge path both fact tables take at 100 TB.
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(r4(dsum(col("l_quantity"))).as("qty"), count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, round(${sql.dsum("l_quantity")}, 4) AS qty,
              count(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_sort_global",
      (s, dir) => {
        // Global total-order sort (range-partitioned exchange + per-partition
        // sort at scale).
        Tables.orders(s, dir)
          .select(col("o_orderkey"), r4(col("o_totalprice")).as("price"))
          .orderBy(col("price").desc, col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 4) AS price
             FROM orders ORDER BY price DESC, o_orderkey""")),

    GQuery(
      "q_sort_topk",
      (s, dir) => {
        // orderBy + limit → TakeOrderedAndProject: per-partition top-k then a
        // driver merge of k·P rows, never a full global sort. The 100 TB-safe
        // top-k.
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
          .orderBy(col("net").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount), 4) AS net
             FROM lineitem
             ORDER BY net DESC, l_orderkey, l_linenumber LIMIT 100""")),

    GQuery(
      "q_sort_within",
      (s, dir) => {
        // sortWithinPartitions (SURVEY §2.B sorts): hash-partition by a
        // bucket key, sort inside each partition only — shuffle + local sort,
        // NO global range exchange (the write-sorted-files / merge-join-prep
        // shape at 100 TB; see SortWithinSpec for the plan assertion).
        //
        // A partition walker then PROVES per-partition order: rows of one
        // bucket land in exactly one partition and must arrive contiguous and
        // ascending, so per-bucket stats from a single sequential pass equal
        // group-by min/max/count iff the local sort held (first_key/last_key
        // are read positionally, not via min/max).
        import s.implicits._
        val walked = Tables.orders(s, dir)
          .select(col("o_orderkey"), pmod(col("o_orderkey"), lit(8)).as("bucket"))
          .repartition(8, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("o_orderkey"))
          .as[(Long, Long)]
          .mapPartitions { rows =>
            // one pass: per-bucket (n, first-seen, last-seen, stayed-sorted)
            val acc = scala.collection.mutable.LinkedHashMap
              .empty[Long, (Long, Long, Long, Boolean)]
            var prev: Option[(Long, Long)] = None
            rows.foreach { case (k, b) =>
              val sortedSoFar = prev.forall { case (pk, pb) =>
                b > pb || (b == pb && k >= pk)
              }
              val (n, first, _, ok) = acc.getOrElse(b, (0L, k, k, true))
              acc(b) = (n + 1, first, k, ok && sortedSoFar)
              prev = Some((k, b))
            }
            acc.iterator.map { case (b, (n, first, last, ok)) =>
              (b, n, first, last, ok)
            }
          }
          .toDF("bucket", "n", "first_key", "last_key", "sorted")
        walked.orderBy("bucket")
      },
      Some("""SELECT o_orderkey % 8 AS bucket, count(*) AS n,
             min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
             true AS sorted
             FROM orders GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_join_star",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = broadcast(Tables.customer(s, dir))
        val n = broadcast(Tables.nation(s, dir))
        val r = broadcast(Tables.region(s, dir))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            r4(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("r_name")
      },
      Some(s"""SELECT r_name,
              round(${sql.dsum6("l_extendedprice * (1 - l_discount)")}, 4) AS revenue,
              count(*) AS n
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1 ORDER BY 1""")))
}
