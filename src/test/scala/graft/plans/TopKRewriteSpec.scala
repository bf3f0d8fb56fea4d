package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The row_number()<=k → TopKPerKey optimizer rewrite: fires on the
  * drop-the-rank idiom, produces the same rows, and stays away from every
  * shape where the rank is observable or the semantics differ.
  */
class TopKRewriteSpec extends SparkSpec {

  private lazy val orders: DataFrame = {
    TopKRewrite.ensure(spark)
    spark.read.parquet(s"$sf001/orders.parquet")
  }

  private val w = Window.partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  private def windowTopK(k: Int): DataFrame = orders
    .withColumn("rn", row_number().over(w))
    .filter(col("rn") <= k)
    .select("o_custkey", "o_orderkey")

  test("the rank-dropped window idiom plans as TopKPerKey with no Window") {
    val q = windowTopK(3)
    val rows = q.collect() // execute THIS QueryExecution before reading plans
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerKey"), phys)
    assert(!phys.contains("Window"), phys)
    assert(rows.nonEmpty)
  }

  test("the rewrite returns exactly the window form's rows") {
    // baseline: keep the rank in the output — unrewritable by construction
    val baseline = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
    assert(baseline.queryExecution.executedPlan.toString.contains("Window"))
    val expect = baseline.select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = windowTopK(3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("rn < k and rn = 1 fire with the adjusted limit") {
    val lt = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") < 4).select("o_custkey", "o_orderkey")
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(lt.count() == windowTopK(3).count())
    val eq = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("o_custkey", "o_orderkey")
    assert(eq.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(eq.count() == windowTopK(1).count())
  }

  test("guards: projected rank, rank(), and global top-k stay on Window") {
    // rank visible in the output — removing the Window would be observable
    val keepsRank = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(keepsRank.queryExecution.executedPlan.toString.contains("Window"))
    // rank() admits >k tied rows — not heap-equivalent
    val rankFn = orders.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3).select("o_custkey", "o_orderkey")
    assert(!rankFn.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // empty partition spec — global top-k is TakeOrderedAndProject's job
    val global = orders
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
    assert(!global.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
