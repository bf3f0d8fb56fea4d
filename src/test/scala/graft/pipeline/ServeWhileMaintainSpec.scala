package graft.pipeline

import graft.SparkSpec
import graft.pipeline.VectorSync.VecEvent
import graft.queries.{GraphServing, IndexedLayout, KnnGraphBuild}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The deployment's STEADY STATE, finally driven end-to-end: the
  * maintainer loop ([[IndexSync]] with `servingPackDir` — layout + graph
  * epochs, compaction, pack refresh + pack vacuum per cycle) churns
  * upserts and deletes WHILE [[WalkServe]] answers a live query stream
  * against the same pack, fold cadence on. Every prior spec drove one
  * side with the other stopped (GraphServingFreshnessE2eSpec reopens a
  * handle between stopped syncs; WalkServeSpec refreshes manually
  * between batches); here both loops run CONCURRENTLY across three
  * refresh cycles, so the interleavings the scaladocs argue from the
  * EpochStore protocol — a serve-side reopen racing a refresh commit, a
  * fold racing the maintainer's pack vacuum, reads of a pack epoch being
  * superseded mid-batch — actually happen, and the STREAM's output is
  * what gets asserted: an upserted vector answers within batches, a
  * deleted one vanishes, and neither loop ever dies on a torn read.
  */
class ServeWhileMaintainSpec extends SparkSpec {

  private val (nc, bts, tbls, kk) = (8, 6, 8, 5)
  private val (xId, yId, zId) = (9100001L, 9100002L, 9100003L)

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def tmp(p: String) = {
    val d = Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def vecOf(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).head.getSeq[Float](1).toArray

  private def flipped(id: Long): Array[Float] =
    vecOf(id).zipWithIndex.map { case (v, i) => if (i % 2 == 0) v else -v }

  private def writeEvents(dir: String, name: String,
      evs: Seq[VecEvent]): Unit = {
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

  test("maintainer churn and a live query stream run CONCURRENTLY over three refresh cycles: upserts answer through the stream, deletes vanish, no loop dies") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val layoutDir = tmp("swm_layout")
    val graphDir = tmp("swm_graph")
    val packDir = tmp("swm_pack")
    val srcDir = tmp("swm_events")
    val ckptM = tmp("swm_ckpt_m")
    val outDir = tmp("swm_out")
    val ckptS = tmp("swm_ckpt_s")

    IndexedLayout.write(spark, emb, layoutDir, kCells = nc)
    KnnGraphBuild.build(spark, emb, graphDir, kk, tbls, bitsOverride = bts)
    GraphServing.build(spark, graphDir, emb, packDir)

    val (xVec, yVec, zVec) = (flipped(11), flipped(7), flipped(19))
    val reopens0 = Metrics.global.value("graft_walkserve_reopens_total")
    val refresh0 = Metrics.global.value("graft_indexsync_pack_refreshes_total")

    val qSrc = MemoryStream[(Long, Seq[Float])]
    // BOTH loops up before any churn: compactEvery = 1 so every absorbed
    // event epoch triggers compact + pack refresh + pack vacuum while
    // query batches keep arriving; foldEvery = 2 keeps the serve-side
    // fold/vacuum cycle churning at the same time
    val maintainer = IndexSync.start(fileEvents(srcDir), layoutDir,
      graphDir, ckptM, compactEvery = 1, servingPackDir = packDir)
    val serving = WalkServe.start(qSrc.toDS().toDF("q_id", "q_emb"),
      packDir, outDir, ckptS, k = kk, foldEvery = 2)
    // distinct probe q_id per attempt: each poll round is its own query,
    // so an answer is attributable to a batch that ran AFTER the churn
    var nextQ = -1000L
    def askUntil(vec: Array[Float], timeoutMs: Long = 180000)(
        good: Array[org.apache.spark.sql.Row] => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        val qid = nextQ; nextQ -= 1
        qSrc.addData((qid, vec.toSeq))
        serving.query.processAllAvailable()
        // results() is a listing-time snapshot under an ACTIVE fold
        // cadence — re-ask on a listing race, exactly per its contract
        val got = try WalkServe.results(spark, outDir)
          .filter(col("q_id") === qid).collect()
        catch { case _: Throwable => Array.empty[org.apache.spark.sql.Row] }
        ok = good(got)
        if (!ok) Thread.sleep(200)
      }
      assert(ok, s"stream did not converge within ${timeoutMs}ms")
    }
    try {
      // cycle 1: add X (new direction — unique self-cos 1.0), delete 23.
      // The STREAM must answer X at rank 1 once the maintainer's refresh
      // lands and the loop reopens at a batch boundary.
      writeEvents(srcDir, "b1.json", Seq(
        VecEvent("ADD", 1, xId, xVec, 0),
        VecEvent("DELETE", 2, 23L, Array.empty[Float], 0)))
      askUntil(xVec) { got =>
        got.exists(r => r.getLong(2) == xId && r.getInt(1) == 1) &&
          got.forall(_.getLong(2) != 23L)
      }
      // cycle 2: delete X, add Y — Y must answer, X must never surface
      writeEvents(srcDir, "b2.json", Seq(
        VecEvent("DELETE", 3, xId, Array.empty[Float], 0),
        VecEvent("ADD", 4, yId, yVec, 0)))
      askUntil(yVec) { got =>
        got.exists(r => r.getLong(2) == yId && r.getInt(1) == 1) &&
          got.forall(_.getLong(2) != xId)
      }
      // cycle 3: one more upsert — the loops keep interleaving
      writeEvents(srcDir, "b3.json", Seq(
        VecEvent("ADD", 5, zId, zVec, 0)))
      askUntil(zVec) { got =>
        got.exists(r => r.getLong(2) == zId && r.getInt(1) == 1)
      }
      // neither loop died on a torn read anywhere in the interleaving
      assert(serving.query.exception.isEmpty,
        s"serving loop failed: ${serving.query.exception}")
      assert(maintainer.exception.isEmpty,
        s"maintainer loop failed: ${maintainer.exception}")
      assert(Metrics.global.value("graft_indexsync_pack_refreshes_total")
        >= refresh0 + 3, "three churn cycles must have refreshed the pack")
      assert(Metrics.global.value("graft_walkserve_reopens_total")
        >= reopens0 + 3,
        "the serving loop must have reopened onto each refreshed epoch")
      // the serve-side fold cadence ran under the races too
      val st = serving.describe()
      assert(st.foldEpoch >= 0, s"fold cadence never fired: $st")
    } finally {
      serving.stop()
      maintainer.stop()
    }
  }
}
