package graft

import org.apache.spark.sql.SparkSession

/** ANN tuning probe: recall@k of each approximate similarity query vs the
  * exact q_sim_topk, with wall-clock, at an arbitrary sf-dir — the
  * measurement loop behind the QualityChecksSpec floors (the spec pins
  * sf0.001; the floors are tuned so sf0.1 clears them too).
  * `runMain graft.RecallProbe [sfDir]`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): (Array[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def toPairs(rows: Array[org.apache.spark.sql.Row], maxRnk: Int) =
      rows.filter(_.getAs[Int]("rnk") <= maxRnk)
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet

    // warm once so JIT/codegen doesn't pollute the comparison
    Seq("q_sim_topk", "q_sim_topk_lsh", "q_sim_ivf_kmeans", "q_sim_topk_pq")
      .foreach(n => SparkEntry.queries(n)(spark, sfDir).count())

    // one exact run serves both cut-offs — rnk<=3 is a filter of rnk<=5
    val (exactRows, tExact) = run("q_sim_topk")
    val exact5 = toPairs(exactRows, 5)
    val e3 = toPairs(exactRows, 3)
    val results = Seq(
      ("q_sim_topk_lsh", 5, exact5), ("q_sim_ivf_kmeans", 3, e3),
      ("q_sim_topk_pq", 5, exact5)).map { case (name, k, exact) =>
      val (rows, secs) = run(name)
      val got = toPairs(rows, k)
      val recall = if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size
      f""""$name":{"recall@$k":$recall%.3f,"sec":$secs%.2f}"""
    }
    println(s"""{"sf":"$sfDir","exact_sec":$tExact,${results.mkString(",")}}""")
    spark.stop()
  }
}
