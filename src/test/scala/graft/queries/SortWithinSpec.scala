package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** sortWithinPartitions (SURVEY §2.B sorts row): the plan must be a local
  * per-partition sort over a hash exchange — no global range exchange — and
  * the partition walker in q_sort_within must observe sorted runs.
  */
class SortWithinSpec extends SparkSpec {

  private def plan(): String = {
    val df = graft.Tables.orders(spark, sf001)
      .select(col("o_orderkey"), pmod(col("o_orderkey"), lit(8)).as("bucket"))
      .repartition(8, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("o_orderkey"))
    df.queryExecution.explainString(FormattedMode)
  }

  test("plan is hash exchange + local sort, no global range exchange") {
    val p = plan()
    assert(p.contains("Sort"), p)
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("rangepartitioning"), p)
    // formatted mode prints SortExec args as "[...ordering...], <global>, 0"
    assert(p.contains("], false, 0"), p)
    assert(!p.contains("], true, 0"), p)
  }

  test("q_sort_within walker observes per-partition sorted runs") {
    val fn = graft.SparkEntry.queries("q_sort_within")
    val rows = fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("sorted")), rows.mkString("\n"))
    // walker's positional first/last equal min/max per bucket iff sorted
    val expect = graft.Tables.orders(spark, sf001)
      .groupBy(pmod(col("o_orderkey"), lit(8)).as("bucket"))
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("first_key"),
        max("o_orderkey").as("last_key"))
      .orderBy("bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)
  }
}
