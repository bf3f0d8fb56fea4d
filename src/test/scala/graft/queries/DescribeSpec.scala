package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The three persisted stores' introspection verbs: describe() reports
  * the lifecycle state an operator tunes compaction by — dead fractions
  * appear under churn, vanish after compact, the floor rises, the merge
  * width re-bounds — with every field a bounded aggregation.
  */
class DescribeSpec extends SparkSpec {

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  test("IndexedLayout.describe tracks the churn → compact lifecycle") {
    import spark.implicits._
    val d = tmp("desc_layout")
    val emb = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding")
    val n = emb.count()
    IndexedLayout.write(spark, emb, d, kCells = 8)
    val s0 = IndexedLayout.describe(spark, d)
    assert(s0.epoch == 0 && s0.floor == 0 && s0.maxVecId == n - 1)
    assert(s0.cells > 1 && s0.cells <= 8) // kmeans may leave a cell empty
    assert(s0.rowsOnDisk == n && s0.liveRows == n &&
      s0.deadRows == 0 && s0.tombstonedIds == 0)

    // churn: delete a slice, upsert flipped versions of another
    val dead = emb.select("vec_id").filter(col("vec_id") % 89 === 7)
    val nDead = dead.count()
    IndexedLayout.delete(spark, dead, d)
    val upd = emb.filter(col("vec_id") % 97 === 3)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(-x as float))"))
      .localCheckpoint()
    val nUpd = upd.count()
    IndexedLayout.upsert(spark, upd, d)
    val s1 = IndexedLayout.describe(spark, d)
    assert(s1.epoch == 2 && s1.floor == 0)
    assert(s1.liveRows == n - nDead)
    assert(s1.deadRows == nDead + nUpd, s"$s1") // victims + superseded copies
    assert(s1.tombstonedIds == nDead + nUpd)
    assert(s1.rowsOnDisk == s1.liveRows + s1.deadRows)

    // compact reclaims the dead rows, drops tombstones, raises the floor
    IndexedLayout.compact(spark, d)
    val s2 = IndexedLayout.describe(spark, d)
    assert(s2.epoch == 3 && s2.floor == 3)
    assert(s2.liveRows == n - nDead && s2.deadRows == 0 &&
      s2.tombstonedIds == 0 && s2.rowsOnDisk == s2.liveRows)
  }

  test("InvertedIndex.describe tracks postings liveness and netted stats") {
    import spark.implicits._
    val d = tmp("desc_invidx")
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    InvertedIndex.build(spark, docs, d)
    val s0 = InvertedIndex.describe(spark, d)
    assert(s0.epoch == 0 && s0.floor == 0 && s0.nDocs == docs.count())
    assert(s0.postingsOnDisk == s0.livePostings && s0.deadPostings == 0)
    assert(s0.buckets <= InvertedIndex.Buckets)

    // one atomic CDC epoch: update 7, delete 11
    InvertedIndex.applyDelta(spark,
      Seq((7L, "dup sort merge")).toDF("doc_id", "text"),
      Seq(11L).toDF("doc_id"), d)
    val s1 = InvertedIndex.describe(spark, d)
    assert(s1.epoch == 1 && s1.nDocs == s0.nDocs - 1) // -11, 7 replaced
    assert(s1.deadPostings > 0 && s1.tombstonedDocs == 2)
    assert(s1.postingsOnDisk == s1.livePostings + s1.deadPostings)

    // compact reclaims; the floor rises to the compaction epoch
    InvertedIndex.compact(spark, d)
    val s2 = InvertedIndex.describe(spark, d)
    assert(s2.epoch == 2 && s2.floor == 2)
    assert(s2.deadPostings == 0 && s2.tombstonedDocs == 0)
    assert(s2.nDocs == s1.nDocs && s2.tokTotal == s1.tokTotal)
  }

  test("MatView.describe tracks merge width, pending retractions, and the replay gate") {
    import spark.implicits._
    val d = tmp("desc_view")
    val base = Seq((1L, 10.0), (1L, 5.0), (2L, 7.0)).toDF("k", "v")
    MatView.bootstrap(spark, base, Seq("k"), Seq("v"), d)
    assert(MatView.describe(spark, d) ==
      MatView.ViewStats(0, 0, -1L, 1, 2, 0))

    // an out-of-order retraction: key 3's DELETE arrives before its
    // INSERT — the group exists with a pending (negative) count, unserved
    MatView.refresh(spark, d, base.limit(0),
      Seq((3L, 4.0)).toDF("k", "v"), streamEpoch = 9L)
    val s1 = MatView.describe(spark, d)
    assert(s1 == MatView.ViewStats(1, 0, 9L, 2, 2, 1))

    // the matching insert lands; compaction re-bounds the merge width
    MatView.refresh(spark, d, Seq((3L, 4.0)).toDF("k", "v"), base.limit(0))
    val s2 = MatView.describe(spark, d)
    assert(s2.deltaDirs == 3 && s2.groupsServed == 2 && s2.groupsPending == 1,
      s"$s2") // 3 nets to zero-count: exactly cancelled, still on disk
    MatView.compact(spark, d)
    val s3 = MatView.describe(spark, d)
    assert(s3.deltaDirs == 1 && s3.groupsServed == 2 && s3.groupsPending == 0)
    assert(s3.floor == s3.epoch && s3.streamEpoch == 9L)
  }

  test("KnnGraphBuild.describe tracks the delta → delete → vacuum lifecycle") {
    import spark.implicits._
    val d = tmp("desc_graph")
    val e = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").localCheckpoint()
    KnnGraphBuild.build(spark, e, d, k = 5)
    val s0 = KnnGraphBuild.describe(spark, d)
    assert(s0.epoch == 0 && s0.edgesBase == 0 && s0.edgeShards == 0 &&
      s0.method == "lsh" && s0.k == 5 && s0.sigShards == 1 &&
      s0.tombEpochs == 0)
    // the meta-tracked served edge count — introspection without a scan
    assert(s0.edges == KnnGraphBuild.readGraph(spark, d).count())
    // ... and the meta-tracked live vertex count (Meta.vecCount)
    assert(s0.vertices == e.count(), s"vertices ${s0.vertices}")
    // a delta appends an edge change shard; a delete adds a tombstone epoch
    val ins = e.orderBy("vec_id").limit(3)
      .withColumn("vec_id", col("vec_id") + 800000L)
    KnnGraphBuild.delta(spark, ins, d)
    KnnGraphBuild.deleteVecs(spark, Seq(4L).toDF("vec_id"), d)
    val s2 = KnnGraphBuild.describe(spark, d)
    assert(s2.epoch == 2 && s2.edgesBase == 0 && s2.edgeShards == 2 &&
      s2.sigShards == 3 && s2.tombEpochs == 1 && s2.maxVecId == 800002L,
      s"$s2")
    assert(s2.edges == KnnGraphBuild.readGraph(spark, d).count(),
      "tracked count must survive the delta + delete verbs")
    // +3 inserted, −1 deleted — arithmetic, no scan; a delete of a
    // NOT-live id must not double-subtract (the replay no-op contract)
    assert(s2.vertices == e.count() + 3 - 1, s"vertices ${s2.vertices}")
    KnnGraphBuild.deleteVecs(spark, Seq(4L).toDF("vec_id"), d)
    val sR = KnnGraphBuild.describe(spark, d)
    assert(sR.vertices == e.count() + 3 - 1,
      "a replayed delete of an already-dead id must not move the count")
    // vacuum keeps live shards (below-base only) — stats unchanged
    KnnGraphBuild.vacuum(spark, d)
    assert(KnnGraphBuild.describe(spark, d) == sR.copy())
  }
}
