package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The VectorIndex driver-collect budget must fail loudly at train time
  * (VERDICT r7 item 7) — an oversized centroid/codebook request raises a
  * clear requirement error before any corpus-sized work starts, never an
  * opaque driver OOM mid-job.
  */
class DriverBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq.tabulate(16)(i => (i.toLong, Seq.fill(4)(i.toDouble)))
    .toDF("vec_id", "embedding")

  test("kmeansCentroids rejects k·dim above the budget, loudly") {
    val e = intercept[IllegalArgumentException] {
      VectorIndex.kmeansCentroids(spark, vecs, k = 8, iters = 1, maxDriverEntries = 16L)
    }
    assert(e.getMessage.contains("driver") && e.getMessage.contains("sample"))
    // same k/dim passes under the default budget
    assert(VectorIndex.kmeansCentroids(spark, vecs, k = 8, iters = 1).count() == 8)
  }

  test("pqCodebooks rejects m·k·subdim above the budget, loudly") {
    val sv = VectorIndex.subvectors(vecs, m = 2, dim = 4)
    val e = intercept[IllegalArgumentException] {
      VectorIndex.pqCodebooks(spark, sv, m = 2, k = 4, iters = 1, maxDriverEntries = 8L)
    }
    assert(e.getMessage.contains("driver") && e.getMessage.contains("sample"))
    assert(VectorIndex.pqCodebooks(spark, sv, m = 2, k = 4, iters = 1).count() == 8)
  }

  test("pqCodebooksDriver rejects a sample above the row budget, loudly") {
    val sv = VectorIndex.subvectors(vecs, m = 2, dim = 4)
    // 16 vecs × m=2 = 32 sample rows; budget 8 entries / subDim 2 = 4 rows
    val e = intercept[IllegalArgumentException] {
      VectorIndex.pqCodebooksDriver(spark, sv, m = 2, k = 4, iters = 1,
        subDim = 2, maxDriverEntries = 8L)
    }
    assert(e.getMessage.contains("driver budget") && e.getMessage.contains("sample"))
    assert(VectorIndex.pqCodebooksDriver(
      spark, sv, m = 2, k = 4, iters = 1, subDim = 2).count() == 8)
  }

  test("pqCodebooksDriver matches the distributed trainer's codebook") {
    // same init, same assignment rule, same mean update — the two trainers
    // must agree on this integer-valued fixture (no FP-order ambiguity)
    val sv = VectorIndex.subvectors(vecs, m = 2, dim = 4)
    val dist = VectorIndex.pqCodebooks(spark, sv, m = 2, k = 4, iters = 2)
      .orderBy("sub", "cell").collect()
    val drv = VectorIndex.pqCodebooksDriver(spark, sv, m = 2, k = 4, iters = 2,
      subDim = 2).orderBy("sub", "cell").collect()
    assert(dist.map(_.toString).toSeq == drv.map(_.toString).toSeq)
  }

  test("empty corpus still short-circuits cleanly (dim resolves to 0)") {
    val empty = vecs.filter(lit(false))
    assert(VectorIndex.kmeansCentroids(spark, empty, k = 4, iters = 1).count() == 0)
  }
}
