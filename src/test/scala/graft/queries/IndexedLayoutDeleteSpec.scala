package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tombstoned DELETE/UPSERT against the physical IVF layout: no data file
  * is rewritten, yet the live corpus and the pruned search behave exactly
  * as a from-scratch layout of the final state under the same pinned
  * quantizer — and re-applying a CDC epoch that lost its marker converges
  * instead of duplicating rows.
  */
class IndexedLayoutDeleteSpec extends SparkSpec {

  private val (nc, np, kk) = (16, 2, 5)

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def queries = graft.Tables.embeddings(spark, sf001)
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def deadIds = emb.select("vec_id").filter(col("vec_id") % 89 === 7)

  test("delete tombstones: live corpus shrinks, pruned search ≡ layout of survivors") {
    val d = tmp("ivf_del")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    val n = emb.count()
    val nDead = deadIds.count()
    assert(IndexedLayout.delete(spark, deadIds, d) == nDead)
    // raw files untouched, live view excludes exactly the dead ids
    assert(spark.read.parquet(d).count() == n)
    val live = IndexedLayout.readCorpus(spark, d)
    assert(live.count() == n - nDead)
    assert(live.join(deadIds, Seq("vec_id"), "left_semi").count() == 0)
    // search equivalence vs a fresh layout of the survivors, same quantizer
    val d2 = tmp("ivf_del_surv")
    IndexedLayout.write(spark, emb.join(deadIds, Seq("vec_id"), "left_anti"),
      d2, centroidsOverride = IndexedLayout.readCentroids(spark, d))
    val got = canon(IndexedLayout.prunedTopK(spark, d, queries, kk, np))
    assert(got.nonEmpty &&
      got == canon(IndexedLayout.prunedTopK(spark, d2, queries, kk, np)))
  }

  test("upsert replaces in place; replaying the same epoch's CDC converges") {
    val d = tmp("ivf_ups")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    val n = emb.count()
    val updated = emb.join(deadIds, Seq("vec_id"), "left_semi")
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> cast(x * (1 + 0.1 * ((i + vec_id) % 3)) as float))"))
      .localCheckpoint()
    assert(IndexedLayout.upsert(spark, updated, d) == updated.count())
    val live = IndexedLayout.readCorpus(spark, d)
    // exactly one live copy per id; the updated ids carry the NEW vectors
    assert(live.count() == n)
    assert(live.select("vec_id").distinct().count() == n)
    val want = emb.join(deadIds, Seq("vec_id"), "left_anti").unionByName(updated)
    assert(canon(live.select("vec_id", "embedding")) == canon(want))
    // search equivalence vs a fresh layout of the final state
    val d2 = tmp("ivf_ups_want")
    IndexedLayout.write(spark, want, d2,
      centroidsOverride = IndexedLayout.readCentroids(spark, d))
    val got = canon(IndexedLayout.prunedTopK(spark, d, queries, kk, np))
    assert(got.nonEmpty &&
      got == canon(IndexedLayout.prunedTopK(spark, d2, queries, kk, np)))
    // a replay that lost its marker re-applies the SAME logical delta as a
    // new epoch: the newer tombstones kill the earlier application's rows,
    // so the live view still has exactly one copy per id
    IndexedLayout.applyDelta(spark, updated, updated.limit(0).select("vec_id"), d)
    val replayed = IndexedLayout.readCorpus(spark, d)
    assert(replayed.count() == n)
    assert(canon(replayed.select("vec_id", "embedding")) == canon(want))
  }

  test("deleting unknown ids is a harmless no-op record") {
    import spark.implicits._
    val d = tmp("ivf_del_unknown")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    val before = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))
    IndexedLayout.delete(spark, Seq(888888801L, 888888802L).toDF("vec_id"), d)
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == before)
  }
}
