package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Time travel over the layout's epoch history: readCorpus(asOf = e)
  * reconstructs exactly the live view as it stood after epoch e, for
  * every committed epoch; prunedTopK(asOf) serves the snapshot at the
  * search surface; and compaction raises the history floor — snapshots
  * older than the floor CLAMP to it rather than returning a silently
  * incomplete view (the Delta VACUUM contract).
  */
class IndexedLayoutTimeTravelSpec extends SparkSpec {

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

  private def live(d: String, asOf: Int = -1): Seq[String] =
    canon(IndexedLayout.readCorpus(spark, d, asOf)
      .select("vec_id", "embedding"))

  test("asOf reconstructs every committed epoch; compact raises the floor") {
    val d = tmp("ivf_timetravel")
    IndexedLayout.write(spark, emb, d, kCells = 8)
    val snap0 = live(d)

    // epoch 1: delete a slice
    val dead = emb.select("vec_id").filter(col("vec_id") % 97 === 11)
      .localCheckpoint()
    assert(dead.count() > 0)
    IndexedLayout.delete(spark, dead, d)
    val snap1 = live(d)

    // epoch 2: upsert flipped versions of another slice
    val updated = emb.filter(col("vec_id") % 97 === 12)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(-x as float))"))
      .localCheckpoint()
    assert(updated.count() > 0)
    IndexedLayout.upsert(spark, updated, d)
    val snap2 = live(d)

    // epoch 3: append fresh ids
    IndexedLayout.append(spark,
      emb.limit(3).withColumn("vec_id", col("vec_id") + 800000L)
        .localCheckpoint(), d)
    val snap3 = live(d)
    assert(Seq(snap0, snap1, snap2, snap3).distinct.size == 4,
      "fixture: each epoch must change the live view")

    // every epoch reconstructs; out-of-range clamps to newest
    assert(live(d, asOf = 0) == snap0)
    assert(live(d, asOf = 1) == snap1)
    assert(live(d, asOf = 2) == snap2)
    assert(live(d, asOf = 3) == snap3)
    assert(live(d, asOf = 99) == snap3)

    // the snapshot is served at the SEARCH surface too: querying with a
    // deleted vector's own embedding finds it at rank 1 as of epoch 0,
    // and never after its delete epoch
    val deadId = dead.orderBy("vec_id").head.getLong(0)
    val q = emb.filter(col("vec_id") === deadId)
      .select(lit(888888L).as("q_id"), col("embedding").as("q_emb"))
    val hit0 = IndexedLayout.prunedTopK(spark, d, q, k = 1, nprobe = 8,
      maxFallbackFrac = 1.0, asOf = 0).collect()
    assert(hit0.length == 1 && hit0.head.getLong(2) == deadId,
      s"asOf=0 must answer with the then-live $deadId, got ${hit0.toSeq}")
    val after = IndexedLayout.prunedTopK(spark, d, q, k = 10, nprobe = 8,
      maxFallbackFrac = 1.0, asOf = 1).collect()
    assert(!after.exists(_.getLong(2) == deadId),
      "asOf=1 must not surface the epoch-1-deleted vector")

    // compaction raises the floor; older snapshots clamp to it (and the
    // compacted live view is snap3, so the clamp is also value-visible)
    assert(IndexedLayout.historyFloor(spark, d) == 0)
    val (cells, _) = IndexedLayout.compact(spark, d)
    assert(cells > 0)
    assert(IndexedLayout.historyFloor(spark, d) == 4)
    assert(live(d) == snap3, "compaction must preserve the live view")
    assert(live(d, asOf = 1) == snap3,
      "below-floor snapshots must clamp to the compacted state")
    assert(live(d, asOf = 99) == snap3)
  }
}
