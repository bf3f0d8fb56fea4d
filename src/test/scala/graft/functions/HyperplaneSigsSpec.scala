package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperplaneSigs (native fused LSH kernel) vs the HOF composition:
  * bucket-identical signatures on the real corpus — the property that
  * keeps q_sim_topk_lsh's candidate sets unchanged after the swap.
  */
class HyperplaneSigsSpec extends SparkSpec {
  import VectorFunctions._

  test("native signatures equal the HOF form on every embedding, several shapes") {
    val e = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        lshSignatures(col("embedding"), bits = 4, tables = 16).as("fast"),
        lshSignaturesHof(col("embedding"), bits = 4, tables = 16).as("hof"),
        lshSignatures(col("embedding"), bits = 7, tables = 3).as("fast2"),
        lshSignaturesHof(col("embedding"), bits = 7, tables = 3).as("hof2"))
    assert(e.filter(col("fast") =!= col("hof") || col("fast2") =!= col("hof2")).isEmpty)
    assert(e.count() > 0)
  }

  test("a wrong-length vector yields the HOF's all-zero buckets") {
    import spark.implicits._
    val r = Seq(Seq(1.0f, -2.0f, 3.0f)) // dim expected = 64
      .toDF("embedding")
      .select(
        lshSignatures(col("embedding"), bits = 4, tables = 2).as("fast"),
        lshSignaturesHof(col("embedding"), bits = 4, tables = 2).as("hof"))
      .head()
    assert(r.getSeq[Long](0) == Seq(0L, 0L))
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("a null vector yields a null signature array") {
    import spark.implicits._
    val r = Seq[(Long, Seq[Float])]((1L, null)).toDF("id", "embedding")
      .select(lshSignatures(col("embedding"), bits = 4, tables = 2).as("fast"))
      .head()
    assert(r.isNullAt(0))
  }
}
