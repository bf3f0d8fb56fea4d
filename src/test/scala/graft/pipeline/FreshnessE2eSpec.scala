package graft.pipeline

import graft.SparkSpec
import graft.pipeline.VectorSync.VecEvent
import graft.queries.{IndexedLayout, KnnGraphBuild}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The USER-VISIBLE freshness contract of the whole namesake story, in one
  * flow: CDC events in → the vector STORE epoch (VectorSync) → the physical
  * INDEX epochs (IndexSync: layout + graph) → a search that answers with
  * the just-upserted vector and without the just-deleted one — across a
  * stop/restart recovery between two event batches. IndexSyncSpec proves
  * state convergence; this spec proves what a USER observes at the query
  * surface (reference analog: the e2e detect→payload round-trip,
  * test/e2e/e2e_test.go:401-456).
  */
class FreshnessE2eSpec extends SparkSpec {

  private val (nc, bts, tbls, kk) = (8, 6, 8, 5)
  private val (xId, yId) = (9000001L, 9000002L)

  private def eventually(timeoutMs: Long = 90000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(cond, s"condition not met within ${timeoutMs}ms")
  }

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def vecOf(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).head.getSeq[Float](1).toArray

  private def writeEvents(dir: String, name: String, evs: Seq[VecEvent]): Unit = {
    val lines = evs.map { e =>
      s"""{"event_type":"${e.event_type}","event_seq":${e.event_seq},""" +
        s""""vec_id":${e.vec_id},"embedding":[${e.embedding.mkString(",")}],""" +
        s""""label":${e.label}}"""
    }
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))
  }

  private def fileEvents(dir: String) = {
    implicit val enc: org.apache.spark.sql.Encoder[VecEvent] =
      org.apache.spark.sql.Encoders.product[VecEvent]
    spark.readStream.schema(enc.schema).json(dir).as[VecEvent]
  }

  private def markerCount(stateRoot: String): Int = {
    val md = new org.apache.hadoop.fs.Path(s"$stateRoot/stream")
    val fs = md.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(md)) 0 else fs.listStatus(md).length
  }

  test("source→store→index→query: fresh upserts answer, deletes vanish, across a recovery") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val layoutDir = tmp("fresh_layout")
    val graphDir = tmp("fresh_graph")
    val srcDir = tmp("fresh_src")
    val ckptIdx = tmp("fresh_ckpt_idx")
    val ckptStore = tmp("fresh_ckpt_store")

    // bootstrap the downstream store and both physical index stores
    IndexedLayout.write(spark, emb, layoutDir, kCells = nc)
    KnnGraphBuild.build(spark, emb, graphDir, kk, tbls, bitsOverride = bts)
    val store = new VectorSync.VectorStore
    store.applyEpoch(-1L, emb.collect().toSeq.map(r =>
      VecEvent("ADD", 0, r.getLong(0), r.getSeq[Float](1).toArray, 0)))

    // Y: a genuinely new direction (sign-flip half the dims of a corpus
    // vector) so its top-1 is itself, never an accidental parallel
    val xVec = vecOf(3).map(_ * 0.9f)
    val yVec = vecOf(7).zipWithIndex.map { case (v, i) =>
      if (i % 2 == 0) v else -v
    }
    val upd17 = vecOf(17).map(-_)

    // ---- batch 1: add X, update 17, delete 23 ----
    writeEvents(srcDir, "b1.json", Seq(
      VecEvent("ADD", 1, xId, xVec, 0),
      VecEvent("UPDATE", 2, 17L, upd17, 0),
      VecEvent("DELETE", 3, 23L, Array.empty[Float], 0)))
    val idx1 = IndexSync.start(fileEvents(srcDir), layoutDir, graphDir, ckptIdx)
    val st1 = VectorSync.start(fileEvents(srcDir), store, ckptStore)
    try eventually() {
      markerCount(s"$graphDir/_graft_state") >= 1 &&
        store.get(xId).isDefined
    } finally { idx1.stop(); st1.stop() }

    // the "crash": both queries are gone; the store object survives (it
    // stands in for the external DB, which outlives the Spark job)

    // ---- batch 2 lands while we're down: delete X, add Y ----
    writeEvents(srcDir, "b2.json", Seq(
      VecEvent("DELETE", 4, xId, Array.empty[Float], 0),
      VecEvent("ADD", 5, yId, yVec, 0)))

    // ---- recovery: same checkpoints pick up exactly the new batch ----
    val idx2 = IndexSync.start(fileEvents(srcDir), layoutDir, graphDir, ckptIdx)
    val st2 = VectorSync.start(fileEvents(srcDir), store, ckptStore)
    try eventually() {
      markerCount(s"$graphDir/_graft_state") >= 2 &&
        store.get(yId).isDefined
    } finally { idx2.stop(); st2.stop() }

    // STORE freshness: Y present, X gone, 17 on its new value, 23 gone
    assert(store.get(yId).exists(_._1.sameElements(yVec)))
    assert(store.get(xId).isEmpty)
    assert(store.get(17L).exists(_._1.sameElements(upd17)))
    assert(store.get(23L).isEmpty)

    // LAYOUT freshness at the QUERY surface: searching for Y's vector
    // answers Y first (cos 1.0); X and 23 appear nowhere
    val qFresh = Seq((-1L, yVec.toSeq), (-2L, upd17.toSeq))
      .toDF("q_id", "q_emb")
      .selectExpr("q_id", "cast(q_emb as array<float>) as q_emb")
    val rows = IndexedLayout.prunedTopK(spark, layoutDir, qFresh,
      k = kk, nprobe = nc).collect()
    val top = rows.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top(-1L) == yId, s"top-1 for Y's vector was ${top(-1L)}")
    assert(top(-2L) == 17L, s"top-1 for 17's NEW vector was ${top(-2L)}")
    assert(rows.forall(r => r.getLong(2) != xId && r.getLong(2) != 23L))

    // GRAPH freshness: Y is a vertex; X and 23 are neither vertices nor
    // anyone's neighbor
    val g = KnnGraphBuild.readGraph(spark, graphDir).localCheckpoint()
    val verts = g.select("q_id").distinct().as[Long].collect().toSet
    assert(verts.contains(yId))
    assert(!verts.contains(xId) && !verts.contains(23L))
    assert(g.filter(col("vec_id").isin(xId, 23L)).isEmpty)
  }
}
