package graft.queries

import graft.{Recall, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** q_sim_knn_graph contract (VERDICT r6 item 1): the corpus-vs-corpus
  * top-k build must (a) recall >= 0.9 of the exact brute-force graph,
  * (b) carry NO broadcast hint — every side of its joins is corpus-sized
  * by definition, so a broadcast anywhere is a scale bug, and (c) produce
  * a well-formed directed graph (k rows per vector, ranked, no self
  * edges). Recall goes through [[graft.Recall]] — the same code path
  * RecallProbe measures with, so the floor and the probe cannot diverge.
  */
class KnnGraphSpec extends SparkSpec {

  private lazy val graph =
    graft.SparkEntry.queries("q_sim_knn_graph")(spark, sf001)
  private lazy val rows = graph.collect()

  test("recall@5 >= 0.9 vs the exact brute-force graph") {
    val exact = Recall.pairs(
      VectorQueries.bruteKnnGraph(spark, sf001, 5).collect(), 5)
    val got = Recall.pairs(rows, 5)
    val recall = Recall.of(exact, got)
    info(f"knn-graph recall@5 = $recall%.3f (${(exact & got).size}/${exact.size})")
    assert(recall >= 0.9, f"knn-graph recall $recall%.3f below 0.9")
  }

  test("no broadcast hint anywhere in the plan (no small side exists)") {
    val hints = graph.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty,
      s"q_sim_knn_graph must not broadcast a corpus-sized side, found: $hints")
  }

  test("well-formed directed graph: k ranked neighbors per vector, no self edges") {
    val n = graft.Tables.embeddings(spark, sf001).count()
    assert(rows.length == n * 5, s"expected ${n * 5} edges, got ${rows.length}")
    assert(!rows.exists(r => r.getAs[Long]("q_id") == r.getAs[Long]("vec_id")),
      "self edge found")
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == n)
    byQ.foreach { case (q, edges) =>
      assert(edges.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to 5),
        s"vector $q does not have ranks 1..5")
      // ranks were assigned on the 6-decimal score; the output rounds to
      // 4, so only non-increasing cos is observable (4-decimal ties can
      // order by the hidden 6th decimal, not by id)
      val cosInOrder = edges.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(cosInOrder.zip(cosInOrder.tail).forall { case (a, b) => a >= b },
        s"vector $q cos not non-increasing with rank")
    }
  }
}
