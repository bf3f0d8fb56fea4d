package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Bucketing — the 100 TB co-located join story: orders and lineitem
  * written bucketBy(8, key).sortBy(key) join WITHOUT any exchange (both
  * sides' bucketing satisfies the join's required distribution), while the
  * identical unbucketed join shuffles both sides. The result set itself is
  * cross-checked against the plain join.
  */
class BucketedJoinSpec extends SparkSpec {

  private val db = "graft_buckets"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    super.afterAll()
  }

  test("bucketed+sorted tables join with zero exchanges and match the unbucketed result") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val orders = graft.Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouse/orders_b").saveAsTable(s"$db.orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouse/lineitem_b").saveAsTable(s"$db.lineitem_b")

    // sf0.001 tables are under the broadcast threshold; the co-located
    // merge path is the plan under test (at 100 TB neither side
    // broadcasts). Physical planning is lazy, so the conf must cover the
    // executedPlan/collect calls.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val got =
      try {
        val joined = spark.table(s"$db.orders_b")
          .join(spark.table(s"$db.lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
        val plan = joined.queryExecution.executedPlan.toString
        // co-located AND co-sorted: no shuffle before the merge join — the
        // scan's bucket layout feeds SMJ directly (only the final
        // aggregation may exchange)
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
        assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
        joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}
