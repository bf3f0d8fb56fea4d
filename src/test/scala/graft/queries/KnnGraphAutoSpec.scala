package graft.queries

import graft.SparkSpec

/** The LSH→IVF graph-build crossover (VERDICT r8 item 3): knnGraphAuto must
  * (a) switch exactly where the adaptive bit width saturates its clamp —
  * NOT earlier at the radius-2 cost crossover, because the crossover
  * constant is recall-first: at ×5 the default-knob IVF build is 3×
  * cheaper (9.8 s vs 23.2 s) but held only 0.377 recall@5 where LSH's
  * radius widening held 0.955, and driving IVF to the floor costs ~1.7×
  * LSH (nprobe=12: 0.981 at 38 s — IVF_FRONTIER.json; the threshold's
  * scaladoc carries the full two-sided measurement). Past the clamp the
  * auto build hands off at that measured operating point
  * (GraphAutoIvfNprobe = 12), recorded in situ per BENCH_scale run
  * (knn_auto.insitu.switched_recall). And (b) it must be row-identical to
  * the side it picks; each side's recall ≥ 0.9 floor at spec scale is
  * already pinned by KnnGraphSpec / KnnGraphIvfSpec, so identity here
  * inherits those floors on both branches.
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
