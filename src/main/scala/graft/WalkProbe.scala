package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Local iteration probe for the graph-walk SERVING rate (the
  * `graphsearch_queries_per_s` bench field, runnable alone): build the
  * persisted graph + [[graft.queries.GraphServing]] pack untimed over
  * SPARK_GRAFT_SF_DIR, open the warm handle, then time `passes` topK
  * calls and print one JSON line with each pass and the best rate.
  * `runMain graft.WalkProbe [passes]`.
  */
object WalkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val graphDir = java.nio.file.Files.createTempDirectory("walkprobe_g").toString
      val packDir = java.nio.file.Files.createTempDirectory("walkprobe_p").toString
      val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
        .localCheckpoint()
      graft.queries.KnnGraphBuild.build(spark, e, graphDir, k = 5)
      graft.queries.GraphServing.build(spark, graphDir, e, packDir)
      val nQ = 200
      val q = e.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .localCheckpoint()
      def rate(pin: Boolean): (Seq[Double], Double) = {
        val h = graft.queries.GraphServing.open(spark, packDir, pin)
        val times = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          h.topK(q, k = 5).count()
          math.rint((System.nanoTime() - t0) / 1e6) / 1e3
        }
        (times, math.rint(nQ / times.min * 10.0) / 10.0)
      }
      val (tDisk, qpsDisk) = rate(pin = false)
      val (tRam, qpsRam) = rate(pin = true)
      // same-JVM A/B control: the r13 bench shape — frame-based beamTopK
      // over pre-checkpointed graph/corpus/seed frames (host noise makes
      // cross-run comparisons of this loop meaningless; the control pins
      // the old path's cost in THIS window)
      val seeds = graft.queries.GraphSearch.centroidSeeds(spark, e, nSeeds = 16)
        .localCheckpoint()
      val g = graft.queries.KnnGraphBuild.readGraph(spark, graphDir)
        .localCheckpoint()
      val tOld = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.GraphSearch.beamTopK(spark, g, e, q, k = 5,
          seeds = seeds).count()
        math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      }
      val qpsOld = math.rint(nQ / tOld.min * 10.0) / 10.0
      println(s"""{"disk_passes":${tDisk.mkString("[", ",", "]")},""" +
        s""""disk_queries_per_s":$qpsDisk,""" +
        s""""ram_passes":${tRam.mkString("[", ",", "]")},""" +
        s""""ram_queries_per_s":$qpsRam,""" +
        s""""r13_shape_passes":${tOld.mkString("[", ",", "]")},""" +
        s""""r13_shape_queries_per_s":$qpsOld,""" +
        s""""n_queries":$nQ,"sf":"$sfDir"}""")
      Seq(graphDir, packDir).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    } finally spark.stop()
  }
}
