package graft.queries

import graft.{Canon, Tables}
import graft.functions.WeightedAvg
import org.apache.spark.sql.functions._

/** Aggregation family: hash aggs, distinct, rollup/cube, filtered/conditional
  * aggs, collect, min_by/max_by, typed UDAF (SURVEY.md §2.B).
  *
  * All of these are partial+final hash aggregations in Spark (map-side
  * combine before the shuffle), so the exchange carries one row per group per
  * partition, not the fact table. Numeric sums run in exact decimal (Canon)
  * so parallel merge order can't perturb the oracle hash.
  */
object AggQueries {
  import Canon._

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_agg_pricing",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            r4(dsum(col("l_quantity"))).as("sum_qty"),
            r4(dsum(col("l_extendedprice"))).as("sum_base"),
            r4(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc"),
            r4(dsum6(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax")))).as("sum_charge"),
            r4(davg(col("l_quantity"))).as("avg_qty"),
            r4(davg(col("l_extendedprice"))).as("avg_price"),
            r4(davg(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              round(${sql.dsum("l_quantity")}, 4) AS sum_qty,
              round(${sql.dsum("l_extendedprice")}, 4) AS sum_base,
              round(${sql.dsum6("l_extendedprice * (1 - l_discount)")}, 4) AS sum_disc,
              round(${sql.dsum6("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}, 4) AS sum_charge,
              round(${sql.davg("l_quantity")}, 4) AS avg_qty,
              round(${sql.davg("l_extendedprice")}, 4) AS avg_price,
              round(${sql.davg("l_discount")}, 4) AS avg_disc,
              count(*) AS n
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '2000-01-01'
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_agg_distinct",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("nd_parts"),
            countDistinct(col("l_suppkey")).as("nd_supps"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_parts,
             count(DISTINCT l_suppkey) AS nd_supps, count(*) AS n
             FROM lineitem GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_approx",
      (s, dir) => {
        // HLL sketch — checked rows-only (no oracle: approximate by design;
        // cross-engine hash parity is impossible and not meaningful).
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .orderBy("l_returnflag")
      },
      None),

    GQuery(
      "q_agg_rollup",
      (s, dir) => {
        Tables.orders(s, dir)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), r4(dsum(col("o_totalprice"))).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
          .orderBy("status", "priority")
      },
      Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n, round(${sql.dsum("o_totalprice")}, 4) AS total
              FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
              ORDER BY status, priority""")),

    GQuery(
      "q_agg_cube",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), r4(dsum(col("l_quantity"))).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("qty"))
          .orderBy("rf", "ls")
      },
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
              coalesce(l_linestatus, 'ALL') AS ls,
              count(*) AS n, round(${sql.dsum("l_quantity")}, 4) AS qty
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY rf, ls""")),

    GQuery(
      "q_agg_gsets",
      (s, dir) => {
        // Explicit GROUPING SETS with grouping_id, via the SQL surface.
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS priority,
                 grouping_id(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
                 FROM orders_v
                 GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                         (o_orderstatus), ())
                 ORDER BY gid, status, priority""")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             grouping_id(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
             FROM orders
             GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                     (o_orderstatus), ())
             ORDER BY gid, status, priority""")),

    GQuery(
      "q_agg_filtered",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count_if(col("o_totalprice") > 50000).as("n_big"),
            r4(dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))))
              .as("f_total"),
            count(lit(1)).as("n"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name,
              count(CASE WHEN o_totalprice > 50000 THEN 1 END) AS n_big,
              round(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                AS DECIMAL(28,4))) AS DOUBLE), 4) AS f_total,
              count(*) AS n
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_collect",
      (s, dir) => {
        Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
            size(sort_array(collect_set(col("n_name")))).as("n_distinct"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             count(DISTINCT n_name) AS n_distinct
             FROM nation JOIN region ON n_regionkey = r_regionkey
             GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_minmaxby",
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy("o_custkey")
          .agg(
            max_by(col("o_orderkey"), struct(col("o_totalprice"), -col("o_orderkey")))
              .as("best_order"),
            min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
              .as("worst_order"))
          .orderBy("o_custkey")
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rmax,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
              FROM orders)
             SELECT o_custkey,
                    max(CASE WHEN rmax = 1 THEN o_orderkey END) AS best_order,
                    max(CASE WHEN rmin = 1 THEN o_orderkey END) AS worst_order
             FROM r GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_pivot",
      (s, dir) => {
        // Pivot: one column per order status, counts + decimal-exact sums.
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), r4(dsum(col("o_totalprice"))).as("total"))
          .na.fill(0L, Seq("F_n", "O_n", "P_n"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
              count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
              round(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                AS DECIMAL(28,4))) AS DOUBLE), 4) AS F_total,
              count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
              round(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END
                AS DECIMAL(28,4))) AS DOUBLE), 4) AS O_total,
              count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n,
              round(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END
                AS DECIMAL(28,4))) AS DOUBLE), 4) AS P_total
              FROM orders GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_quantile",
      (s, dir) => {
        // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
        // quantile_cont); approximate sketches are q_agg_approx's job.
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            r4(expr("percentile(l_quantity, 0.25)")).as("q25"),
            r4(expr("percentile(l_quantity, 0.5)")).as("median"),
            r4(expr("percentile(l_quantity, 0.75)")).as("q75"),
            r4(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.25), 4) AS q25,
             round(quantile_cont(l_quantity, 0.5), 4) AS median,
             round(quantile_cont(l_quantity, 0.75), 4) AS q75,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
             FROM lineitem GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_salted",
      (s, dir) => {
        // Skew-safe two-phase aggregation (functions.Skew): l_returnflag has
        // only 3 values — at 100 TB each is a hot key; salting spreads the
        // partial phase over 16 sub-keys. Semantically identical to a plain
        // group-by (decomposable aggs in exact decimal), so the oracle is
        // the unsalted SQL.
        import graft.functions.Skew
        import org.apache.spark.sql.types.DecimalType
        Skew.saltedAgg(
          Tables.lineitem(s, dir),
          Seq("l_returnflag"),
          col("l_orderkey") * 10 + col("l_linenumber"),
          buckets = 16)(
          // keep phase-1 partials in exact decimal; cast once after merge
          "sum_qty" -> sum(col("l_quantity").cast(DecimalType(28, 4))),
          "n" -> count(lit(1)))
          .select(col("l_returnflag"),
            r4(col("sum_qty").cast("double")).as("sum_qty"), col("n"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, round(${sql.dsum("l_quantity")}, 4) AS sum_qty,
              count(*) AS n
              FROM lineitem GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_weighted",
      (s, dir) => {
        val wavg = udaf(WeightedAvg)
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(r4(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag,
              round(${sql.dsum6("l_extendedprice * l_quantity")} /
                    ${sql.dsum("l_quantity")}, 4) AS wavg_price
              FROM lineitem GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_agg_histogram",
      (s, dir) => {
        // Equi-width histogram — the profiling staple: value bucketed at
        // width 50 per event_type, count + exact-decimal mean per bucket.
        // One partial+final aggregation on (type, bucket); bucket count,
        // not row count, bounds the output at any scale.
        Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") / 50.0).cast("long").as("bucket"),
            col("value"))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"), r4(davg(col("value"))).as("mean_v"))
          .orderBy("event_type", "bucket")
      },
      Some(s"""SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket,
              count(*) AS n, round(${sql.davg("value")}, 4) AS mean_v
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_agg_unpivot",
      (s, dir) => {
        // Wide-to-long reshaping (melt) — q_agg_pivot's inverse, through the
        // native unpivot operator (Expand under the hood: each input row
        // fans out to one row per value column in a single narrow pass —
        // no shuffle beyond the feeding aggregation, no join). The metric
        // columns share LONG so the melted value column needs no cast.
        import org.apache.spark.sql.Column
        val wide = Tables.documents(s, dir)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"))
        wide.unpivot(
            Array[Column](col("lang")),
            Array[Column](col("n_docs"), col("min_chars"), col("max_chars")),
            "metric", "value")
          .orderBy("lang", "metric")
      },
      Some("""WITH w AS (SELECT lang, count(*) AS n_docs,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
                FROM documents GROUP BY 1)
              SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
              UNION ALL SELECT lang, 'min_chars', min_chars FROM w
              UNION ALL SELECT lang, 'max_chars', max_chars FROM w
              ORDER BY lang, metric""")))
}
