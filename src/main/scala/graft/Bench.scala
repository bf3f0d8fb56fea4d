package graft
import org.apache.spark.sql.SparkSession

/** BENCH harness (BASELINE.md): runs every catalog query at the sf-dir from
  * SPARK_GRAFT_SF_DIR, prints one JSON line of per-query wall-clock seconds.
  *
  * Queries run in sorted-name order so timings attribute deterministically,
  * after a short warmup (scans all tables + one agg + one vector query) so
  * the first timed query doesn't absorb JIT/codegen/classloading cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    Seq("q_scan_count", "q_agg_pricing", "q_sim_pairs").foreach { w =>
      qs.get(w).foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => })
    }
    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
