package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DELETE (and the delete+re-insert upsert) against the persisted k-NN
  * graph: tombstoning dead vectors and re-ranking only the victim vertices
  * must leave the graph ROW-IDENTICAL to a full rebuild over the
  * survivors — the dual of the delta ≡ rebuild proofs, for both candidate
  * structures. This is the half of the pipeline's upsert+delete contract
  * (A14, debounce.go:104-121) the persisted ANN state was missing.
  */
class KnnGraphDeleteSpec extends SparkSpec {

  private val (kk, tbls, bts) = (5, 8, 6)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  // ids spread through the corpus so some are certainly stored neighbors
  private def deadIds = emb.select("vec_id").filter(col("vec_id") % 97 === 3)

  test("LSH: deleteVecs ≡ full rebuild over the survivors, bit-for-bit") {
    val out = tmp("knn_del")
    KnnGraphBuild.build(spark, emb, out, kk, tbls, bitsOverride = bts)
    val before = KnnGraphBuild.readGraph(spark, out)
    // fixture: the dead set must actually appear in stored top-k lists,
    // otherwise the victim re-rank path is never exercised
    val victims = before.join(deadIds, Seq("vec_id"), "left_semi")
      .join(deadIds.withColumnRenamed("vec_id", "q_id"), Seq("q_id"), "left_anti")
    assert(victims.count() > 0, "fixture: deleted ids are nobody's neighbor")
    val nAfter = KnnGraphBuild.deleteVecs(spark, deadIds, out)
    // the arithmetically-maintained count survives the delete verb too
    assert(nAfter == KnnGraphBuild.readGraph(spark, out).count(),
      "meta-tracked edge count diverged after delete")

    val outSurv = tmp("knn_del_surv")
    KnnGraphBuild.build(spark,
      emb.join(deadIds, Seq("vec_id"), "left_anti"), outSurv,
      kk, tbls, bitsOverride = bts)
    val got = canon(KnnGraphBuild.readGraph(spark, out))
    assert(got.nonEmpty && got == canon(KnnGraphBuild.readGraph(spark, outSurv)))
  }

  test("IVF: deleteVecs ≡ rebuild over survivors under the same quantizer") {
    val out = tmp("knn_del_ivf")
    KnnGraphBuild.buildIvf(spark, emb, out, kk, nprobe = 3)
    KnnGraphBuild.deleteVecs(spark, deadIds, out)

    val outSurv = tmp("knn_del_ivf_surv")
    KnnGraphBuild.buildIvf(spark,
      emb.join(deadIds, Seq("vec_id"), "left_anti"), outSurv, kk, nprobe = 3,
      centroidsOverride = KnnGraphBuild.readCentroids(spark, out))
    val got = canon(KnnGraphBuild.readGraph(spark, out))
    assert(got.nonEmpty && got == canon(KnnGraphBuild.readGraph(spark, outSurv)))
  }

  test("upsert = deleteVecs + delta: re-inserted ids ≡ rebuild with new vectors") {
    val out = tmp("knn_ups")
    KnnGraphBuild.build(spark, emb, out, kk, tbls, bitsOverride = bts)
    // new versions of the dead ids: deterministically perturbed embeddings
    val updated = emb.join(deadIds, Seq("vec_id"), "left_semi")
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> cast(x * (1 + 0.1 * ((i + vec_id) % 3)) as float))"))
      .localCheckpoint()
    KnnGraphBuild.deleteVecs(spark, deadIds, out)
    KnnGraphBuild.delta(spark, updated, out)

    val outWant = tmp("knn_ups_want")
    KnnGraphBuild.build(spark,
      emb.join(deadIds, Seq("vec_id"), "left_anti").unionByName(updated),
      outWant, kk, tbls, bitsOverride = bts)
    val got = canon(KnnGraphBuild.readGraph(spark, out))
    assert(got.nonEmpty && got == canon(KnnGraphBuild.readGraph(spark, outWant)))
  }

  test("deletes are tolerant and guarded: unknown ids no-op, live ids stay illegal to re-insert") {
    import spark.implicits._
    val out = tmp("knn_del_edge")
    KnnGraphBuild.build(spark, emb, out, kk, tbls, bitsOverride = bts)
    val before = canon(KnnGraphBuild.readGraph(spark, out))
    // deleting never-seen ids is a harmless no-op epoch (CDC replay safety)
    KnnGraphBuild.deleteVecs(spark,
      Seq(999999901L, 999999902L).toDF("vec_id"), out)
    assert(canon(KnnGraphBuild.readGraph(spark, out)) == before)
    // an id that was NOT tombstoned still cannot be re-inserted
    val ex = intercept[IllegalArgumentException] {
      KnnGraphBuild.delta(spark, emb.limit(5), out)
    }
    assert(ex.getMessage.contains("must not be LIVE"))
    // empty delete resolves state and changes nothing
    KnnGraphBuild.deleteVecs(spark, emb.select("vec_id").limit(0), out)
    assert(canon(KnnGraphBuild.readGraph(spark, out)) == before)
  }
}
