package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew.saltedAgg decomposability gate: sum/count/min/max merge correctly
  * across salt buckets; avg and wrapped expressions are rejected instead of
  * silently mis-merging per-salt partials.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("a", 1L), ("a", 5L), ("a", 2L), ("b", 10L), ("b", 20L))
    .toDF("k", "v")

  test("sum/count/min/max match the unsalted aggregation") {
    val got = Skew.saltedAgg(fixture, Seq("k"), col("v"), buckets = 4)(
      "s" -> sum("v"), "n" -> count(lit(1)), "lo" -> min("v"), "hi" -> max("v"))
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 8L, 3L, 1L, 5L), ("b", 30L, 2L, 10L, 20L)))
  }

  test("avg is rejected as non-decomposable") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAgg(fixture, Seq("k"), col("v"), buckets = 4)("a" -> avg("v"))
    }
    assert(e.getMessage.contains("does not merge"))
  }

  test("wrapped aggregate expressions are rejected") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAgg(fixture, Seq("k"), col("v"), buckets = 4)(
        "s1" -> (sum("v") + lit(1)))
    }
    assert(e.getMessage.contains("not a bare aggregate"))
  }

  test("DISTINCT aggregates are rejected as non-decomposable") {
    // hash(uniq) scatters equal values across salts — each bucket counts
    // them once and the sum-merge would multiple-count
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAgg(fixture, Seq("k"), col("v"), buckets = 4)(
        "d" -> countDistinct(col("v")))
    }
    assert(e.getMessage.contains("DISTINCT"))
    val e2 = intercept[IllegalArgumentException] {
      Skew.saltedAgg(fixture, Seq("k"), col("v"), buckets = 4)(
        "sd" -> sum_distinct(col("v")))
    }
    assert(e2.getMessage.contains("DISTINCT"))
  }

  test("non-positive bucket count is rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(fixture, Seq("k"), col("v"), buckets = 0)("s" -> sum("v"))
    }
  }
}
