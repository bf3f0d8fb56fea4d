package graft.pipeline

import graft.SparkSpec
import graft.pipeline.LexIndexSync.DocEvent
import graft.queries.InvertedIndex
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The USER-VISIBLE freshness contract on the LEXICAL side — the
  * [[FreshnessE2eSpec]] template over [[LexIndexSync]]: document CDC in →
  * the persisted [[InvertedIndex]] epochs → a BM25 search that answers
  * with the just-upserted document and without the just-deleted one —
  * across a stop/restart recovery between two event batches.
  * LexIndexSyncSpec proves state convergence (serve ≡ rebuild); this
  * spec proves what a USER observes at the bm25TopK surface (reference
  * analog: the e2e detect→payload round-trip,
  * test/e2e/e2e_test.go:401-456).
  */
class LexFreshnessE2eSpec extends SparkSpec {

  private val (xId, yId) = (9000001L, 9000002L)

  private def eventually(timeoutMs: Long = 90000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(cond, s"condition not met within ${timeoutMs}ms")
  }

  private def docs = graft.Tables.documents(spark, sf001)
    .select("doc_id", "text")

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def writeEvents(dir: String, name: String,
      evs: Seq[DocEvent]): Unit =
    Files.writeString(Paths.get(dir, name),
      evs.map(e => s"""{"event_type":"${e.event_type}","event_seq":${
        e.event_seq},"doc_id":${e.doc_id},"text":"${e.text}"}""")
        .mkString("\n"))

  private def fileEvents(dir: String) = {
    implicit val enc: org.apache.spark.sql.Encoder[DocEvent] =
      org.apache.spark.sql.Encoders.product[DocEvent]
    spark.readStream.schema(enc.schema).json(dir).as[DocEvent]
  }

  private def markerCount(indexDir: String): Int = {
    val md = new org.apache.hadoop.fs.Path(s"$indexDir/_index/stream")
    val fs = md.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(md)) 0 else fs.listStatus(md).length
  }

  test("source→index→query: fresh upserts answer at the BM25 surface, deletes vanish, across a recovery") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val indexDir = tmp("lexfresh_idx")
    val srcDir = tmp("lexfresh_src")
    val ckpt = tmp("lexfresh_ckpt")
    InvertedIndex.build(spark, docs, indexDir)

    // zebra/quagga/axolotl never occur in the synthetic corpus, so each
    // query's rank-1 is decided purely by the CDC-landed documents
    // ---- batch 1: add X, rewrite doc 17 around a unique token, delete 23 ----
    writeEvents(srcDir, "b1.json", Seq(
      DocEvent("ADD", 1, xId, "zebra fence zebra"),
      DocEvent("UPDATE", 2, 17L, "quagga herd quagga quagga"),
      DocEvent("DELETE", 3, 23L, "")))
    val q1 = LexIndexSync.start(fileEvents(srcDir), indexDir, ckpt,
      triggerMs = 50)
    try eventually() { markerCount(indexDir) >= 1 }
    finally q1.stop()

    // the "crash": the query is gone; batch 2 lands while we're down:
    // delete X, add Y
    writeEvents(srcDir, "b2.json", Seq(
      DocEvent("DELETE", 4, xId, ""),
      DocEvent("ADD", 5, yId, "axolotl tank axolotl")))

    // ---- recovery: the same checkpoint picks up exactly the new batch ----
    val q2 = LexIndexSync.start(fileEvents(srcDir), indexDir, ckpt,
      triggerMs = 50)
    try eventually() { markerCount(indexDir) >= 2 }
    finally q2.stop()

    // freshness at the QUERY surface: Y answers its own token at rank 1,
    // the updated 17 answers its NEW token, and X/23 appear nowhere
    val queries = Seq((-1L, "axolotl swims"), (-2L, "quagga grazes"))
      .toDF("q_id", "text")
    val rows = InvertedIndex.bm25TopK(spark, indexDir, queries, k = 10)
      .collect()
    val top = rows.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top(-1L) == yId, s"rank-1 for Y's unique token was ${top.get(-1L)}")
    assert(top(-2L) == 17L, s"rank-1 for 17's NEW token was ${top.get(-2L)}")
    assert(rows.forall(r => r.getLong(2) != xId && r.getLong(2) != 23L),
      "the deleted X and 23 must vanish from every result")

    // and the deleted doc's own token finds nothing but the survivors:
    // X's "zebra" now matches no document at all
    val zq = Seq((-3L, "zebra crossing")).toDF("q_id", "text")
    assert(InvertedIndex.bm25TopK(spark, indexDir, zq, k = 10)
      .filter(col("doc_id") === xId).isEmpty)
  }
}
