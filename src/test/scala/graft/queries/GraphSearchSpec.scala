package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Beam search over the k-NN graph: recall floor vs the exact top-k
  * (the rows-only ANN contract), determinism, per-(q, v) single scoring
  * by construction, and the persisted-graph serving form.
  */
class GraphSearchSpec extends SparkSpec {

  private val kk = 5

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def queries = graft.Tables.embeddings(spark, sf001)
    .filter(col("vec_id") < 20)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  /** recall@k of `got` vs the brute-force truth, averaged over queries. */
  private def recallVsBrute(got: Array[org.apache.spark.sql.Row]): Double = {
    val e = emb.withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("embedding")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    val truth = broadcast(queries
      .withColumn("q_n", graft.functions.VectorFunctions.l2Norm(col("q_emb"))))
      .join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(graft.functions.VectorFunctions.cosineWithNorms(
        col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kk)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val gotBy = got.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val per = truth.map { case (q, t) =>
      gotBy.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    per.sum / per.size
  }

  test("beam search over the LSH graph holds the recall floor and is deterministic") {
    val g = VectorQueries.knnGraph(spark, sf001, k = kk, tables = 6)
      .localCheckpoint()
    val res = GraphSearch.beamTopK(spark, g, emb, queries, k = kk)
    val rows = res.collect()
    val rec = recallVsBrute(rows)
    info(f"beam-search recall@$kk = $rec%.3f")
    // measured 0.95+ at sf0.001 (beam 32, 4 rounds, 16 seeds, undirected
    // edges); floor leaves noise headroom while still proving the walk
    // NAVIGATES (seeds alone, k=5 from 16 arbitrary ids, would sit far
    // below it)
    assert(rec >= 0.85, f"recall $rec%.3f < 0.85")
    // deterministic: a re-run returns the identical rows
    assert(canon(GraphSearch.beamTopK(spark, g, emb, queries, k = kk)) ==
      rows.map(_.toSeq.mkString("|")).sorted.toSeq)
    // every query answers with k rows
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == kk))
  }

  test("seeds alone score far below the walk — the rounds do the navigating") {
    val g = VectorQueries.knnGraph(spark, sf001, k = kk, tables = 6)
      .localCheckpoint()
    val walked = GraphSearch.beamTopK(spark, g, emb, queries, k = kk)
    val seedOnly = GraphSearch.beamTopK(spark, g, emb, queries, k = kk,
      iters = 0)
    val recWalked = recallVsBrute(walked.collect())
    val recSeed = recallVsBrute(seedOnly.collect())
    info(f"walked=$recWalked%.3f seeds-only=$recSeed%.3f")
    assert(recWalked > recSeed + 0.3,
      f"the walk must add navigation: $recWalked%.3f vs $recSeed%.3f")
  }

  test("centroid-spread seeds rescue a clustered corpus where id-ordered seeds strand the walk") {
    import spark.implicits._
    // 4 tight, mutually ORTHOGONAL clusters of 40 vectors each, with ids
    // 0..39 all in cluster 0 — id order correlating with content locality
    // (at 100 TB the lowest ids are one ingest shard), so the 16
    // lowest-id default seeds land in ONE cluster and a walk can never
    // leave it (cross-cluster edges don't exist in the k-NN graph).
    val dim = 64
    def vec(cluster: Int, j: Int): Seq[Float] = {
      val v = Array.fill(dim)(0.0f)
      v(cluster * 16) = 1.0f // the cluster axis
      v(cluster * 16 + 1 + (j % 10)) = 0.05f + 0.001f * j // in-cluster spread
      v.toSeq
    }
    val e = (for (c <- 0 until 4; j <- 0 until 40)
      yield (c * 40L + j, vec(c, j))).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
      .localCheckpoint()
    val eN = e.withColumn("nrm",
      graft.functions.VectorFunctions.l2Norm(col("embedding")))
    // the exact k-NN graph of the fixture (in-spec brute): within-cluster
    // edges only, by orthogonality
    val wG = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    def bruteTop(queries: org.apache.spark.sql.DataFrame) = broadcast(queries
      .withColumn("q_n", graft.functions.VectorFunctions.l2Norm(col("q_emb"))))
      .join(eN, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(graft.functions.VectorFunctions.cosineWithNorms(
        col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(wG))
      .filter(col("rnk") <= kk)
      .select("q_id", "rnk", "vec_id", "cos_r")
    val g = bruteTop(e.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"))).localCheckpoint()
    // queries from the LAST cluster (ids 120+), the farthest from the
    // id-ordered seed set
    val q = e.filter(col("vec_id") >= 120 && col("vec_id") < 125)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val truth = bruteTop(q).select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val gotBy = rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      val per = truth.map { case (qq, t) =>
        gotBy.getOrElse(qq, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    val recId = recallOf(
      GraphSearch.beamTopK(spark, g, e, q, k = kk).collect())
    val seeds = GraphSearch.centroidSeeds(spark, e, nSeeds = 4)
    assert(seeds.count() == 4)
    val recSeed = recallOf(
      GraphSearch.beamTopK(spark, g, e, q, k = kk, seeds = seeds).collect())
    info(f"clustered fixture: id-seeds=$recId%.3f centroid-seeds=$recSeed%.3f")
    assert(recId < 0.2,
      f"fixture must strand id-ordered seeds, got $recId%.3f")
    assert(recSeed >= 0.85,
      f"centroid seeds must reach every cluster, got $recSeed%.3f")
  }

  test("the persisted-graph form serves from KnnGraphBuild state on disk") {
    val d = java.nio.file.Files.createTempDirectory("gsearch_state").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    KnnGraphBuild.build(spark, emb, d, k = kk)
    val res = GraphSearch.beamTopK(spark, d, emb, queries, k = kk)
    val rec = recallVsBrute(res.collect())
    info(f"persisted-graph recall@$kk = $rec%.3f")
    assert(rec >= 0.85, f"recall $rec%.3f < 0.85")
  }
}
