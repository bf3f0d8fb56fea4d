package graft.pipeline

import graft.SparkSpec
import graft.pipeline.LexIndexSync.DocEvent
import graft.pipeline.VectorSync.VecEvent
import graft.queries.{HybridSearch, IndexedLayout, InvertedIndex}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The freshness contract at the FUSED serving surface: BOTH sync loops
  * (IndexSync on the vector layout, LexIndexSync on the inverted index)
  * absorb CDC — across a stop/restart recovery — and a hybrid RRF query
  * over the two persisted stores answers with the just-upserted document
  * and without the just-deleted one. FreshnessE2eSpec and
  * LexFreshnessE2eSpec prove each store's surface alone; this spec
  * proves the COMPOSED surface a retrieval user actually queries
  * (HybridSearch.fromIndexes — the q_hybrid_rrf_idx serving path).
  */
class HybridFreshnessE2eSpec extends SparkSpec {

  private val (xId, yId) = (9000001L, 9000002L)
  private val nc = 8

  private def eventually(timeoutMs: Long = 90000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(cond, s"condition not met within ${timeoutMs}ms")
  }

  private def docs = graft.Tables.documents(spark, sf001)
    .select("doc_id", "text")

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def vecOf(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).head.getSeq[Float](1).toArray

  private def writeDocEvents(dir: String, name: String,
      evs: Seq[DocEvent]): Unit =
    Files.writeString(Paths.get(dir, name),
      evs.map(e => s"""{"event_type":"${e.event_type}","event_seq":${
        e.event_seq},"doc_id":${e.doc_id},"text":"${e.text}"}""")
        .mkString("\n"))

  private def writeVecEvents(dir: String, name: String,
      evs: Seq[VecEvent]): Unit =
    Files.writeString(Paths.get(dir, name),
      evs.map(e => s"""{"event_type":"${e.event_type}","event_seq":${
        e.event_seq},"vec_id":${e.vec_id},"embedding":[${
        e.embedding.mkString(",")}],"label":${e.label}}""")
        .mkString("\n"))

  private def docEvents(dir: String) = {
    implicit val enc: org.apache.spark.sql.Encoder[DocEvent] =
      org.apache.spark.sql.Encoders.product[DocEvent]
    spark.readStream.schema(enc.schema).json(dir).as[DocEvent]
  }

  private def vecEvents(dir: String) = {
    implicit val enc: org.apache.spark.sql.Encoder[VecEvent] =
      org.apache.spark.sql.Encoders.product[VecEvent]
    spark.readStream.schema(enc.schema).json(dir).as[VecEvent]
  }

  private def markerCount(stateRoot: String): Int = {
    val md = new org.apache.hadoop.fs.Path(s"$stateRoot/stream")
    val fs = md.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(md)) 0 else fs.listStatus(md).length
  }

  test("both loops' CDC reaches the fused hybrid surface, across a recovery") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val lexDir = tmp("hybfresh_lex")
    val vecDir = tmp("hybfresh_vec")
    val srcLex = tmp("hybfresh_src_lex")
    val srcVec = tmp("hybfresh_src_vec")
    val ckptLex = tmp("hybfresh_ckpt_lex")
    val ckptVec = tmp("hybfresh_ckpt_vec")

    InvertedIndex.build(spark, docs, lexDir)
    IndexedLayout.write(spark, emb, vecDir, kCells = nc)

    // Y: a genuinely new direction (sign-flip half the dims) so its own
    // vector finds it at rank 1; unique tokens make each lexical list
    // decided purely by the CDC-landed documents
    val xVec = vecOf(3).map(_ * 0.9f)
    val yVec = vecOf(7).zipWithIndex.map { case (v, i) =>
      if (i % 2 == 0) v else -v
    }
    val upd17 = vecOf(17).map(-_)

    // ---- batch 1 on BOTH carriers: add X, update 17, delete 23 ----
    writeDocEvents(srcLex, "b1.json", Seq(
      DocEvent("ADD", 1, xId, "zebra fence zebra"),
      DocEvent("UPDATE", 2, 17L, "quagga herd quagga quagga"),
      DocEvent("DELETE", 3, 23L, "")))
    writeVecEvents(srcVec, "b1.json", Seq(
      VecEvent("ADD", 1, xId, xVec, 0),
      VecEvent("UPDATE", 2, 17L, upd17, 0),
      VecEvent("DELETE", 3, 23L, Array.empty[Float], 0)))
    val lex1 = LexIndexSync.start(docEvents(srcLex), lexDir, ckptLex,
      triggerMs = 50)
    val vec1 = IndexSync.start(vecEvents(srcVec), vecDir, null, ckptVec,
      triggerMs = 50)
    try eventually() {
      markerCount(s"$lexDir/_index") >= 1 &&
        markerCount(s"$vecDir/_index") >= 1
    } finally { lex1.stop(); vec1.stop() }

    // the "crash": both queries gone; batch 2 lands while we're down
    writeDocEvents(srcLex, "b2.json", Seq(
      DocEvent("DELETE", 4, xId, ""),
      DocEvent("ADD", 5, yId, "axolotl tank axolotl")))
    writeVecEvents(srcVec, "b2.json", Seq(
      VecEvent("DELETE", 4, xId, Array.empty[Float], 0),
      VecEvent("ADD", 5, yId, yVec, 0)))

    // ---- recovery: the same checkpoints pick up exactly the new batch ----
    val lex2 = LexIndexSync.start(docEvents(srcLex), lexDir, ckptLex,
      triggerMs = 50)
    val vec2 = IndexSync.start(vecEvents(srcVec), vecDir, null, ckptVec,
      triggerMs = 50)
    try eventually() {
      markerCount(s"$lexDir/_index") >= 2 &&
        markerCount(s"$vecDir/_index") >= 2
    } finally { lex2.stop(); vec2.stop() }

    // FUSED freshness: each query hands BOTH modalities of the same
    // intent to the composed surface — Y's token + Y's vector must
    // answer Y at rank 1, 17's new token + new vector must answer 17;
    // X and 23 appear nowhere
    val textQ = Seq((-1L, "axolotl swims"), (-2L, "quagga grazes"))
      .toDF("q_id", "text")
    val embQ = Seq((-1L, yVec.toSeq), (-2L, upd17.toSeq))
      .toDF("q_id", "q_emb")
      .selectExpr("q_id", "cast(q_emb as array<float>) as q_emb")
    val rows = HybridSearch.fromIndexes(spark, lexDir, vecDir,
      textQ, embQ, k = 10, shortK = 10, nprobe = nc).collect()
    val top = rows.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top(-1L) == yId, s"fused rank-1 for Y was ${top.get(-1L)}")
    assert(top(-2L) == 17L, s"fused rank-1 for 17 was ${top.get(-2L)}")
    assert(rows.forall(r => r.getLong(2) != xId && r.getLong(2) != 23L),
      "the deleted X and 23 must vanish from the fused surface")
  }
}
