package graft.pipeline

import graft.SparkSpec
import graft.queries.{GraphServing, KnnGraphBuild}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming QUERY side of graph-walk serving: micro-batches of
  * query vectors answer through one warm pack handle, results land
  * epoch-idempotent, and a maintainer refresh is picked up at the next
  * batch boundary — serving never blocks on maintenance.
  */
class WalkServeSpec extends SparkSpec {

  private val kk = 5

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  test("a query stream serves through one warm handle, epoch-tagged and idempotent; a pack refresh is picked up at the next batch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val gd = tmp("wserve_graph")
    val pd = tmp("wserve_pack")
    val outDir = tmp("wserve_out")
    val ckpt = tmp("wserve_ckpt")
    KnnGraphBuild.build(spark, emb, gd, k = kk)
    GraphServing.build(spark, gd, emb, pd)

    val src = MemoryStream[(Long, Seq[Float])]
    val queries = src.toDS().toDF("q_id", "q_emb")
    val reopens0 = Metrics.global.value("graft_walkserve_reopens_total")
    val stream = WalkServe.start(queries, pd, outDir, ckpt, k = kk)
    try {
      // ---- batch 1: served rows ≡ a direct warm-handle call ----
      val qFrame = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      src.addData(qFrame.collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1))): _*)
      stream.processAllAvailable()
      val direct = GraphServing.open(spark, pd).topK(qFrame, kk)
      assert(canon(WalkServe.results(spark, outDir).drop("batch")) ==
        canon(direct),
        "streamed batch diverged from the direct warm-handle answer")

      // ---- the maintainer refreshes the pack underneath the stream:
      // a NEW direction (sign-flip half the dims ⇒ unique self-cos 1.0)
      // lands via graph delta + pack refresh; the NEXT batch must answer
      // with it at rank 1 — only possible if the loop reopened onto the
      // refreshed epoch ----
      val zId = 7700001L
      val zVec = emb.filter(col("vec_id") === 11L).head.getSeq[Float](1)
        .zipWithIndex.map { case (v, i) => if (i % 2 == 0) v else -v }
      val zRow = Seq((zId, zVec)).toDF("vec_id", "embedding")
        .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
        .localCheckpoint()
      KnnGraphBuild.delta(spark, zRow, gd)
      GraphServing.refresh(spark, gd, emb.unionByName(zRow), pd)
      assert(GraphServing.readMeta(spark, pd).epoch == 1)
      src.addData((-1L, zVec.toSeq))
      stream.processAllAvailable()
      val served = WalkServe.results(spark, outDir)
        .filter(col("q_id") === -1L).collect()
      assert(served.exists(r => r.getLong(2) == zId && r.getInt(1) == 1),
        s"post-refresh batch must answer with the fresh vector, got " +
          served.map(_.getLong(2)).mkString(","))
      assert(Metrics.global.value("graft_walkserve_reopens_total") ==
        reopens0 + 1, "exactly one handle reopen for one pack advance")

      // ---- output is one dir per stream epoch (overwrite-idempotent:
      // a replay rewrites its own dir, nothing accumulates) ----
      val dirs = new java.io.File(outDir).list().filter(_.startsWith("b"))
      assert(dirs.length == 2, s"one result dir per epoch, got ${dirs.toSeq}")
    } finally stream.stop()
  }
}
