package graft.pipeline

import graft.SparkSpec
import graft.pipeline.VectorSync.VecEvent
import graft.queries.{GraphServing, IndexedLayout, KnnGraphBuild}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Freshness at the THIRD search regime's surface: CDC events →
  * IndexSync (layout + graph epochs) → the GraphServing pack refreshed on
  * the loop's own cadence → a WALK over the warm handle that answers with
  * the just-upserted vector and never with a deleted one. FreshnessE2eSpec
  * proves the contract at the pruned-cell surface; this is the same
  * contract where the serving pack is DERIVED state the loop must keep
  * within a cadence of the stream.
  */
class GraphServingFreshnessE2eSpec extends SparkSpec {

  private val (nc, bts, tbls, kk) = (8, 6, 8, 5)
  private val (xId, yId) = (9000001L, 9000002L)

  private def eventually(timeoutMs: Long = 120000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(200)
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

  test("CDC → IndexSync → pack refresh → the walk answers fresh, deletes vanish") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val layoutDir = tmp("gsfresh_layout")
    val graphDir = tmp("gsfresh_graph")
    val packDir = tmp("gsfresh_pack")
    val srcDir = tmp("gsfresh_src")
    val ckpt = tmp("gsfresh_ckpt")

    // bootstrap all three: the stores the loop maintains + the derived pack
    IndexedLayout.write(spark, emb, layoutDir, kCells = nc)
    KnnGraphBuild.build(spark, emb, graphDir, kk, tbls, bitsOverride = bts)
    GraphServing.build(spark, graphDir, emb, packDir)
    assert(GraphServing.isFresh(spark, graphDir, packDir))

    // X and Y get genuinely NEW directions (sign-flip half the dims) so
    // their self-cos 1.0 is unique — the walk's top hit must be themselves
    def flipped(id: Long): Array[Float] = vecOf(id).zipWithIndex.map {
      case (v, i) => if (i % 2 == 0) v else -v
    }
    val (xVec, yVec) = (flipped(11), flipped(7))
    def queryFor(vec: Array[Float]) = Seq((-1L, vec.toSeq)).toDF("q_id", "q_emb")
      .selectExpr("q_id", "cast(q_emb as array<float>) as q_emb")

    // ---- batch 1: add X, delete 23; compactEvery = 1 ⇒ the pack
    // refreshes in the same foreachBatch that applied the epoch ----
    writeEvents(srcDir, "b1.json", Seq(
      VecEvent("ADD", 1, xId, xVec, 0),
      VecEvent("DELETE", 2, 23L, Array.empty[Float], 0)))
    val q1 = IndexSync.start(fileEvents(srcDir), layoutDir, graphDir, ckpt,
      compactEvery = 1, servingPackDir = packDir)
    try eventually() {
      markerCount(s"$graphDir/_graft_state") >= 1 &&
        GraphServing.isFresh(spark, graphDir, packDir)
    } finally q1.stop()
    val h1 = GraphServing.open(spark, packDir)
    val r1 = h1.topK(queryFor(xVec), kk).collect()
    assert(r1.exists(r => r.getLong(2) == xId && r.getInt(1) == 1),
      s"fresh X must answer at rank 1, got ${r1.map(_.getLong(2)).mkString(",")}")
    assert(r1.forall(_.getLong(2) != 23L), "deleted 23 must not answer")

    // ---- batch 2: delete X, add Y — the refreshed pack serves Y and
    // can never surface X (gone from adjacency AND corpus) ----
    writeEvents(srcDir, "b2.json", Seq(
      VecEvent("DELETE", 3, xId, Array.empty[Float], 0),
      VecEvent("ADD", 4, yId, yVec, 0)))
    val q2 = IndexSync.start(fileEvents(srcDir), layoutDir, graphDir, ckpt,
      compactEvery = 1, servingPackDir = packDir)
    try eventually() {
      markerCount(s"$graphDir/_graft_state") >= 2 &&
        GraphServing.isFresh(spark, graphDir, packDir)
    } finally q2.stop()
    val h2 = GraphServing.open(spark, packDir)
    val r2 = h2.topK(queryFor(yVec), kk).collect()
    assert(r2.exists(r => r.getLong(2) == yId && r.getInt(1) == 1),
      s"fresh Y must answer at rank 1, got ${r2.map(_.getLong(2)).mkString(",")}")
    assert(r2.forall(_.getLong(2) != xId), "deleted X must not answer")
    // the superseded pack epoch was vacuumed by the refresh hook
    assert(GraphServing.describe(spark, packDir).epoch >= 1)
  }
}
