package graft.queries

import graft.SparkSpec

/** The LSH→IVF graph-build crossover (VERDICT r8 item 3): knnGraphAuto must
  * (a) switch exactly where the adaptive bit width saturates its clamp, and
  * (b) be row-identical to the side it picks — each side's recall ≥ 0.9
  * floor is already pinned by KnnGraphSpec / KnnGraphIvfSpec, so identity
  * here inherits those floors on both branches.
  */
class KnnGraphAutoSpec extends SparkSpec {

  test("threshold is exactly where adaptiveBits saturates the 16-bit clamp") {
    val t = VectorQueries.GraphAutoIvfThreshold
    assert(VectorQueries.adaptiveBits(t) < 16,
      s"bits at n=$t should still be under the clamp")
    assert(VectorQueries.adaptiveBits(t + 1) == 16,
      s"bits at n=${t + 1} should hit the clamp")
  }

  test("below the threshold the auto build IS the LSH build, row for row") {
    val auto = VectorQueries.knnGraphAuto(spark, sf001, k = 5, tables = 6)
      .collect().map(_.toString).sorted
    val lsh = VectorQueries.knnGraph(spark, sf001, k = 5, tables = 6)
      .collect().map(_.toString).sorted
    assert(auto.sameElements(lsh))
  }

  test("past the threshold the auto build IS the IVF build, row for row") {
    // force the crossover at test scale: any threshold below the corpus
    // size drives the IVF branch
    val auto = VectorQueries.knnGraphAuto(spark, sf001, k = 5, tables = 6,
      nprobe = 3, thresholdOverride = 1L).collect().map(_.toString).sorted
    val ivf = VectorQueries.knnGraphIvf(spark, sf001, k = 5, nprobe = 3)
      .collect().map(_.toString).sorted
    assert(auto.sameElements(ivf))
  }
}
