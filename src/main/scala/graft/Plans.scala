package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for selected catalog queries — the plan-
  * quality feedback loop: verify filters/projections reach the parquet scan
  * (PushedFilters / ReadSchema), dims broadcast, aggregates run
  * partial+final, and hot paths stay inside WholeStageCodegen.
  *
  * Usage: runMain graft.Plans <sfDir> <outFile> [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val only = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try {
          val df = fn(spark, sfDir)
          sb.append(s"==== $name ====\n")
          sb.append(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          sb.append("\n")
        } catch { case e: Throwable => sb.append(s"==== $name FAILED: $e\n") }
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
