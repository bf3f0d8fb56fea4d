package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time + explain individual catalog queries.
  *
  * `runMain graft.Explain q_name [q_name ...]` — prints build seconds (plan
  * construction, including any eager materialization like localCheckpoint),
  * execution seconds for a full-column action, row count, and the formatted
  * physical plan. SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  * Pass -noplan to skip the plan dump, -plan to dump only.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (flags, names) = args.partition(_.startsWith("-"))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      if (!flags.contains("-plan")) {
        val t1 = System.nanoTime()
        // full-column action (unlike count(), which lets Catalyst prune
        // every expensive projection out of the measured plan)
        val n = df.queryExecution.toRdd.count()
        val ran = (System.nanoTime() - t1) / 1e9
        println(f"[explain] $name build=$built%.3fs run=$ran%.3fs rows=$n")
      } else println(f"[explain] $name build=$built%.3fs")
      if (!flags.contains("-noplan")) df.explain("formatted")
    }
    spark.stop()
  }
}
