package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Embedding sync: upsert/delete/last-state-wins into the vector store,
  * epoch-idempotent replay, and checkpoint recovery continuing from
  * committed offsets (the engine's exactly-once upgrade over the
  * reference's at-most-once delivery).
  */
class VectorSyncSpec extends SparkSpec {
  import VectorSync._

  private def eventually(timeoutMs: Long = 30000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(cond, s"condition not met within ${timeoutMs}ms")
  }

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

  test("vector sync applies upserts/deletes with last-state-wins; recovery continues, not replays") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val srcDir = Files.createTempDirectory("vec_src").toString
    val ckpt = Files.createTempDirectory("vec_ckpt").toString
    val store = new VectorStore

    writeEvents(srcDir, "b1.json", Seq(
      VecEvent("ADD", 1, 100, Array(1f, 0f), 7),
      VecEvent("UPDATE", 2, 100, Array(0f, 1f), 8), // last-state-wins in-epoch
      VecEvent("ADD", 3, 200, Array(5f, 5f), 1),
      VecEvent("DELETE", 4, 200, Array.empty[Float], 0)))

    val q1 = VectorSync.start(fileEvents(srcDir), store, ckpt)
    try {
      eventually() { store.get(100L).isDefined }
      assert(store.get(100L).get._1.toSeq == Seq(0f, 1f)) // v2 won
      assert(store.get(100L).get._2 == 8)
      assert(store.get(200L).isEmpty) // deleted in the same epoch
      assert(store.size == 1)
    } finally q1.stop()

    val appliedBefore = store.applications.get()
    // restart from the checkpoint with the same store: committed work must
    // NOT re-apply; new files must flow
    writeEvents(srcDir, "b2.json", Seq(VecEvent("ADD", 5, 300, Array(2f, 2f), 3)))
    val q2 = VectorSync.start(fileEvents(srcDir), store, ckpt)
    try {
      eventually() { store.get(300L).isDefined }
      assert(store.size == 2) // 100 + 300; no duplicate application of b1
    } finally q2.stop()
    assert(store.applications.get() >= appliedBefore + 1)
  }

  test("epoch replay is a no-op (idempotent sink)") {
    val store = new VectorStore
    val evs = Seq(VecEvent("ADD", 1, 1, Array(1f), 0))
    assert(store.applyEpoch(42, evs))
    assert(!store.applyEpoch(42, evs)) // replayed epoch skipped
    assert(store.applications.get() == 1)
    assert(store.size == 1)
  }
}
