package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The change-data-feed over the physical index's epoch history: applying
  * `changesBetween(a, b)` to snapshot(a) must land exactly on
  * snapshot(b) for every epoch pair, net semantics coalesce
  * within-window churn, and a diff across a compaction boundary fails
  * loudly instead of emitting the whole corpus as fake upserts.
  */
class IndexedLayoutCdfSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def snap(d: String, e: Int): Seq[String] =
    canon(IndexedLayout.readCorpus(spark, d, asOf = e)
      .select("vec_id", "embedding"))

  /** Apply a diff to a snapshot the way a downstream consumer would:
    * drop every changed id, then land the upsert rows.
    */
  private def applyDiff(snapshot: org.apache.spark.sql.DataFrame,
      diff: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val touched = diff.select("vec_id")
    snapshot.join(touched, Seq("vec_id"), "left_anti")
      .unionByName(diff.filter(col("change") === "upsert")
        .select("vec_id", "embedding"))
  }

  test("applying changesBetween(a, b) to snapshot(a) yields snapshot(b), every pair") {
    val d = tmp("cdf_converge")
    IndexedLayout.write(spark, emb, d, kCells = 4)
    // e1: delete a slice; e2: append fresh ids; e3: upsert (replace) some
    IndexedLayout.delete(spark, emb.select("vec_id")
      .filter(col("vec_id") % 7 === 2), d)
    IndexedLayout.append(spark,
      emb.limit(3).withColumn("vec_id", col("vec_id") + 910000L)
        .localCheckpoint(), d)
    IndexedLayout.upsert(spark,
      emb.filter(col("vec_id") % 11 === 4)
        .withColumn("embedding", transform(col("embedding"), x => -x))
        .localCheckpoint(), d)
    for (a <- 0 to 3; b <- a to 3) {
      val diff = IndexedLayout.changesBetween(spark, d, a, b).localCheckpoint()
      val applied = canon(applyDiff(
        IndexedLayout.readCorpus(spark, d, asOf = a)
          .select("vec_id", "embedding"), diff))
      assert(applied == snap(d, b), s"diff $a→$b did not converge")
      if (a == b) assert(diff.isEmpty, s"self-diff $a→$a must be empty")
    }
  }

  test("net semantics: within-window churn coalesces; add-then-delete nets out") {
    import graft.pipeline.IndexSync
    import graft.pipeline.VectorSync.VecEvent
    val d = tmp("cdf_net")
    val corpus = emb.filter(col("vec_id") < 200)
    IndexedLayout.write(spark, corpus, d, kCells = 4)
    val v17 = corpus.filter(col("vec_id") === 17)
      .head.getSeq[Float](1).toArray
    IndexSync.applyBatch(spark, Seq(
      VecEvent("ADD", 1, 9000001L, v17.map(_ * 0.5f), 0),
      VecEvent("UPDATE", 2, 17L, v17.map(-_), 0),
      VecEvent("DELETE", 3, 23L, Array.empty[Float], 0)),
      epochId = 1L, layoutDir = d, graphDir = null)
    IndexSync.applyBatch(spark, Seq(
      VecEvent("DELETE", 4, 9000001L, Array.empty[Float], 0)),
      epochId = 2L, layoutDir = d, graphDir = null)
    val diff = IndexedLayout.changesBetween(spark, d, 0, 2)
      .select("change", "vec_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // 9000001 was added AND deleted inside the window: absent. 17 emits
    // one upsert (its final value), 23 one delete.
    assert(diff == Set(("upsert", 17L), ("delete", 23L)), diff.toString)
    val up17 = IndexedLayout.changesBetween(spark, d, 0, 2)
      .filter(col("change") === "upsert")
      .head.getSeq[Float](2).toArray
    assert(up17.toSeq == v17.map(-_).toSeq, "upsert must carry the FINAL value")
    // the intermediate window still sees the transient id
    val d01 = IndexedLayout.changesBetween(spark, d, 0, 1)
      .select("change", "vec_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(d01 == Set(("upsert", 9000001L), ("upsert", 17L), ("delete", 23L)))
  }

  test("a diff from below the compaction floor fails loudly") {
    val d = tmp("cdf_floor")
    IndexedLayout.write(spark, emb, d, kCells = 4)
    IndexedLayout.delete(spark, emb.select("vec_id")
      .filter(col("vec_id") % 5 === 1), d)
    IndexedLayout.compact(spark, d) // epoch 2, floor 2
    // from=0 would cross the re-stamp boundary → refuse, never fabricate
    intercept[IllegalArgumentException] {
      IndexedLayout.changesBetween(spark, d, 0, 2).collect()
    }
    // at the floor itself the diff is served (and empty: nothing changed
    // since the compaction epoch)
    assert(IndexedLayout.changesBetween(spark, d, 2, 2).isEmpty)
  }
}
