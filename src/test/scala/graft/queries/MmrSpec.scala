package graft.queries

import graft.SparkSpec
import graft.queries.GraphSearch.MmrCand
import org.apache.spark.sql.functions._

/** The MMR re-rank: the distributed flatMapGroups result equals the
  * driver-side greedy selection over the collected shortlists EXACTLY
  * (plumbing check), the greedy itself picks diversity over redundancy
  * on a hand-computable fixture (algorithm check), and on real data the
  * MMR list is measurably less self-similar than the plain top-k.
  */
class MmrSpec extends SparkSpec {

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var (dot, na, nb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < a.length) {
      val (x, y) = (a(i).toDouble, b(i).toDouble)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  private def shortlist(k: Int) = {
    import graft.functions.VectorFunctions._
    val e = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").withColumn("nrm", l2Norm(col("embedding")))
    val q = broadcast(e.filter(col("vec_id") < 10).select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("nrm").as("q_n")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    q.join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(cosineWithNorms(
        col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
      .withColumn("srnk", row_number().over(w))
      .filter(col("srnk") <= k)
      .select("q_id", "vec_id", "cos_r", "embedding")
  }

  test("distributed MMR ≡ the driver-side greedy over collected shortlists, exactly") {
    val sl = shortlist(30).localCheckpoint()
    val got = GraphSearch.mmrRerank(spark, sl, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    import spark.implicits._
    val byQ = sl.as[MmrCand].collect().groupBy(_.q_id)
    val want = byQ.toSeq.flatMap { case (q, cands) =>
      GraphSearch.mmrSelect(
        cands.sortBy(c => (-c.cos_r, c.vec_id)), 5, 0.7)
        .zipWithIndex.map { case ((c, s), i) =>
          (q, i + 1, c.vec_id, math.rint(s * 10000.0) / 10000.0) }
    }.sorted
    assert(got == want)
  }

  test("the greedy trades redundancy for diversity on a hand-computable fixture") {
    // q = e1; c1 = e1 (rel 1.0); c2 ≈ c1 (rel .99, redundant — sim to
    // c1 ≈ .99); c3 = the diagonal (rel .7071, diverse — sim to c1 =
    // .7071). Plain relevance order is c1, c2. At λ = 0.4 the second
    // MMR pick scores c2 at .4·.99 − .6·.99 ≈ −.594 and c3 at
    // .4·.7071 − .6·.7071 ≈ −.141, so the diverse c3 must win.
    val c1 = MmrCand(1L, 11L, 1.0, Seq(1f, 0f, 0f, 0f))
    val c2 = MmrCand(1L, 12L, 0.99, Seq(0.99f, 0.141f, 0f, 0f))
    val c3 = MmrCand(1L, 13L, 0.7071, Seq(1f, 1f, 0f, 0f))
    val sel = GraphSearch.mmrSelect(Array(c1, c2, c3), k = 2, lambda = 0.4)
    assert(sel.map(_._1.vec_id) == Seq(11L, 13L),
      s"MMR must pick the diverse c3 over the redundant c2: ${sel.map(_._1.vec_id)}")
    // and at λ=1.0 MMR degenerates to plain relevance order
    val rel = GraphSearch.mmrSelect(Array(c1, c2, c3), k = 2, lambda = 1.0)
    assert(rel.map(_._1.vec_id) == Seq(11L, 12L))
  }

  test("MMR over the pruned physical index ≡ MMR over the brute shortlist when the probe is exact") {
    import graft.functions.VectorFunctions._
    val d = java.nio.file.Files.createTempDirectory("mmr_pruned").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    val nc = 8
    IndexedLayout.write(spark,
      graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding"),
      d, kCells = nc)
    val q = graft.Tables.embeddings(spark, sf001)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // the layout serving path emits round-4 cos (the Canon contract), so
    // the brute reference shortlist rounds identically — parity then
    // proves the re-rank rides the physical index without changing the
    // selection
    val e = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").withColumn("nrm", l2Norm(col("embedding")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r6").desc, col("vec_id").asc)
    val brute = broadcast(q.withColumn("q_n", l2Norm(col("q_emb"))))
      .join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r6", round(cosineWithNorms(
        col("q_emb").cast("array<double>"), col("embedding").cast("array<double>"),
        col("q_n"), col("nrm")), 6))
      .withColumn("srnk", row_number().over(w))
      .filter(col("srnk") <= 30)
      .select(col("q_id"), col("vec_id"),
        graft.Canon.r4(col("cos_r6")).cast("double").as("cos_r"), col("embedding"))
    val want = GraphSearch.mmrRerank(spark, brute, k = 5).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    // nprobe = all cells ⇒ the pruned shortlist is exact
    val got = GraphSearch.mmrOverPruned(spark, d, q, k = 5,
      shortK = 30, nprobe = nc).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(want.nonEmpty && got == want)
  }

  test("MMR over the graph-walk handle ≡ MMR over the walk's own shortlist — the re-rank rides the third regime") {
    val gd = java.nio.file.Files.createTempDirectory("mmr_walk_g").toString
    val pd = java.nio.file.Files.createTempDirectory("mmr_walk_p").toString
    Seq(gd, pd).foreach(p => sys.addShutdownHook(
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))))
    val e0 = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").localCheckpoint()
    KnnGraphBuild.build(spark, e0, gd, k = 5)
    GraphServing.build(spark, gd, e0, pd)
    val h = GraphServing.open(spark, pd)
    val q = e0.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val got = GraphSearch.mmrOverWalk(spark, h, e0, q, k = 5, shortK = 15)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    // the independent recompute: the same warm-handle shortlist, joined
    // and re-ranked by hand — proves the composition adds nothing beyond
    // the walk + the greedy (and, via the walk's own parity spec, that
    // the whole chain rides the persisted pack)
    val sl = h.topK(q, 15)
      .select(col("q_id"), col("vec_id"), col("cos").as("cos_r"))
      .join(e0, "vec_id")
      .select("q_id", "vec_id", "cos_r", "embedding")
    val want = GraphSearch.mmrRerank(spark, sl, k = 5)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(got.nonEmpty && got == want)
    assert(got.size == 10 * 5, s"k must fill per query, got ${got.size}")
  }

  test("on real data the MMR list is less self-similar than the plain top-k") {
    import spark.implicits._
    val sl = shortlist(30).localCheckpoint()
    val byQ = sl.as[MmrCand].collect().groupBy(_.q_id)
    val mmr = GraphSearch.mmrRerank(spark, sl, k = 5, lambda = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    def meanPairSim(ids: Seq[Long], cands: Array[MmrCand]): Double = {
      val by = cands.map(c => c.vec_id -> c.embedding).toMap
      val pairs = for {
        (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      } yield cos(by(a), by(b))
      pairs.sum / pairs.size
    }
    val deltas = byQ.toSeq.map { case (q, cands) =>
      val plain = cands.sortBy(c => (-c.cos_r, c.vec_id)).take(5).map(_.vec_id).toSeq
      val diverse = mmr(q).map(_._2).toSeq
      meanPairSim(plain, cands) - meanPairSim(diverse, cands)
    }
    // averaged over queries the diversity term must buy real spread
    assert(deltas.sum / deltas.size > 0.0,
      s"MMR must reduce mean intra-list similarity: $deltas")
  }
}
