package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator: result-identical to the window form,
  * planned as partial heaps → exchange → final heaps.
  */
class TopKPerKeySpec extends SparkSpec {

  test("matches row_number-window top-3 on orders exactly") {
    val orders = graft.Tables.orders(spark, sf001)
    val native = TopKPerKey(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_custkey", "o_orderkey")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
    assert(native.exceptAll(windowed).isEmpty && windowed.exceptAll(native).isEmpty)
  }

  test("plans as partial + final with one exchange between them") {
    val df = TopKPerKey(graft.Tables.orders(spark, sf001),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerKey"), plan)
    assert(plan.contains("FinalTopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    // partial below the exchange, final above it
    assert(plan.indexOf("FinalTopKPerKey") < plan.indexOf("Exchange"), plan)
    assert(plan.indexOf("Exchange") < plan.indexOf("PartialTopKPerKey"), plan)
  }

  test("partial phase bounds shuffled rows: at most k per key per input partition") {
    import spark.implicits._
    // 4 input partitions × 1 key × k=2 → final sees ≤ 8 rows, emits 2
    val df = spark.range(0, 10000, 1, 4)
      .select(lit(1L).as("k"), col("id").as("v"))
    val top = TopKPerKey(df.toDF(), Seq(col("k")), Seq(col("v").desc), 2)
    assert(top.collect().map(_.getLong(1)).sorted.toSeq == Seq(9998L, 9999L))
  }

  test("property: equals the window form on randomized keyed data") {
    // Deterministic pseudo-random fixture (fixed seed — Bench/Verify-safe
    // determinism matters only for oracles, this is a unit test): skewed
    // keys, ties in the sort value (broken by the unique id, as the
    // contract requires), several k values.
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val rows = (0 until 5000).map { i =>
      (i.toLong, (rnd.nextInt(40) * rnd.nextInt(3)).toLong, rnd.nextInt(25).toDouble)
    }
    val df = rows.toDF("id", "key", "v").repartition(7)
    for (k <- Seq(1, 2, 5, 17)) {
      val native = TopKPerKey(df, Seq(col("key")),
        Seq(col("v").desc, col("id").asc), k)
        .select("id").as[Long].collect().toSet
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("id").as[Long].collect().toSet
      assert(native == windowed, s"k=$k: ${native.size} vs ${windowed.size}")
    }
  }

  test("k larger than any group returns every row") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val top = TopKPerKey(df, Seq(col("k")), Seq(col("v").desc), 100)
    assert(top.count() == 3)
  }
}
