package graft.queries

import graft.{Recall, SparkSpec}

/** q_sim_knn_graph_ivf contract: the IVF-partitioned graph build must
  * (a) recall >= 0.9 of the exact brute-force graph at nprobe = 3, and
  * (b) emit a well-formed directed graph. The structural point — bounded
  * candidates per vector via cell-local self-joins — lives in
  * VectorQueries.knnGraphIvf's scaladoc and plan shape.
  */
class KnnGraphIvfSpec extends SparkSpec {

  private lazy val got =
    graft.SparkEntry.queries("q_sim_knn_graph_ivf")(spark, sf001).collect()

  test("recall@5 >= 0.9 vs the exact brute-force graph") {
    val exact = Recall.pairs(
      VectorQueries.bruteKnnGraph(spark, sf001, 5).collect(), 5)
    val approx = Recall.pairs(got, 5)
    val recall = Recall.of(exact, approx)
    info(f"ivf knn-graph recall@5 = $recall%.3f (${(exact & approx).size}/${exact.size})")
    assert(recall >= 0.9, f"ivf knn-graph recall $recall%.3f below 0.9")
  }

  test("sample-trained quantizer (forced cap) still clears the recall floor") {
    // at 100 TB the quantizer trains on a hash-spread sample, never the
    // corpus (trainFrame) — every driver-tested sf sits under the default
    // cap, so force it here: 16 vectors/cell over sf0.001's 7 cells = a
    // 112-vector training sample for a 500-vector corpus
    val g = VectorQueries.knnGraphIvf(spark, sf001, k = 5, nprobe = 3,
      trainCapPerCell = 16L)
    val approx = graft.Recall.pairs(g.collect(), 5)
    val exact = graft.Recall.pairs(
      VectorQueries.bruteKnnGraph(spark, sf001, 5).collect(), 5)
    val recall = graft.Recall.of(exact, approx)
    info(f"sample-trained ivf graph recall@5 = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("well-formed directed graph: ranked neighbors per vector, no self edges") {
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 5)
      val rnks = rows.map(_.getInt(1)).sorted
      assert(rnks.toSeq == (1 to rows.length), s"q=$q ranks $rnks")
      assert(rows.forall(r => r.getLong(2) != q), s"q=$q has a self edge")
    }
  }
}
