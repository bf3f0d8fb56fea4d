package graft

import org.apache.spark.sql.SparkSession

/** Recall/cost frontier of the IVF k-NN graph at the ×FACTOR probe corpus
  * (VERDICT r9 item 3): sweep (nprobe, cells) through the unchanged
  * [[graft.queries.VectorQueries.knnGraphIvf]] pipeline and record each
  * point's recall@5 against the shared sampled exact oracle plus its
  * wall seconds — the two axes the crossover decision trades.
  *
  * Candidate volume scales as n·nprobe²·(64·n/cells)/n = nprobe²·cellSize,
  * so holding recall by raising nprobe (the only recall knob a
  * signal-free quantizer leaves) buys it at a measured quadratic price —
  * this probe turns that sentence into a table.
  *
  * `runMain graft.IvfGraphProbe [factor] [itersSweep]` — prints one JSON
  * line per config and a final summary line; writes IVF_FRONTIER.json in
  * cwd. The optional second argument is a comma-separated Lloyd-pass
  * sweep (e.g. "1,3") re-testing the iters=1 operating choice; default
  * is the production iters=1 only.
  */
object IvfGraphProbe {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(5)
    val base = "/root/testdata/sf0.1"
    val scaled = s"/tmp/graft_scale_x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ScaleProbe.buildScaled(spark, base, scaled, factor)
    val n = Tables.embeddings(spark, scaled).count()
    val mod = if (n <= 20000L) 1L else math.max(1L, n / 1000L)
    val exact = Recall.pairs(
      graft.queries.VectorQueries.bruteKnnGraph(spark, scaled, 5, mod)
        .collect(), 5)

    // warm codegen on one small build so the first timed point isn't JIT
    graft.queries.VectorQueries.knnGraphIvf(spark, "/root/testdata/sf0.01",
      k = 5, nprobe = 3).count()

    val defaultCells = graft.queries.VectorQueries.ivfCellCount(n)
    // second arg: Lloyd-pass sweep, e.g. "1,3" — re-tests the iters=1
    // "polish doesn't buy recall" claim at the probe scale. Default is
    // the production iters=1 only.
    val itersSweep = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1))
    val configs = for {
      iters <- itersSweep
      cells <- Seq(defaultCells, defaultCells / 2, defaultCells / 4)
      nprobe <- Seq(3, 5, 8, 12)
    } yield (cells, nprobe, iters)

    val rows = configs.map { case (cells, nprobe, iters) =>
      val t0 = System.nanoTime()
      val g = graft.queries.VectorQueries.knnGraphIvf(spark, scaled,
        k = 5, nprobe = nprobe, cellsOverride = cells, iters = iters).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val approx = Recall.pairs(g.filter(_.getLong(0) % mod == 0), 5)
      val recall = math.rint(Recall.of(exact, approx) * 1000) / 1000
      val line = f"""{"cells":$cells,"nprobe":$nprobe,"iters":$iters,""" +
        f""""recall":$recall,"sec":${math.rint(sec * 100) / 100}}"""
      println(line)
      line
    }
    val json = s"""{"factor":$factor,"n":$n,"default_cells":$defaultCells,""" +
      s""""points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("IVF_FRONTIER.json"), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
