package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The data-lake layout surface: a Hive-style partitioned parquet sink and
  * the partition-pruned scan it buys. At 100 TB the partition column is the
  * first-order I/O lever — a filter on it must prune DIRECTORIES at planning
  * time (PartitionFilters), never surface as a post-scan filter over the
  * full corpus. Proven here end-to-end: write documents partitioned by
  * lang, read back with a lang filter, assert both the directory layout and
  * the pruned scan, and that a non-partition filter still pushes down
  * normally.
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("part_docs").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    spark.read.parquet(s"$sf001/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(d)
    d
  }

  /** Data files under one partition directory (what a pruned scan may read). */
  private def filesUnder(sub: String): Long =
    new java.io.File(dir, sub).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet")).toLong

  test("partitionBy writes one lang=... directory per language") {
    val langs = new java.io.File(dir).list().filter(_.startsWith("lang="))
    val expected = spark.read.parquet(s"$sf001/documents.parquet")
      .select("lang").distinct().collect().map("lang=" + _.getString(0))
    assert(langs.sorted.toSeq == expected.sorted.toSeq)
  }

  test("a partition-column filter prunes to one directory at planning time") {
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    // execute THIS QueryExecution (collect, not count) so the scan metrics
    // below belong to the executed plan
    val rows = q.collect().length.toLong
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:"), p)
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
    assert(pf.contains("lang"), s"lang filter not in PartitionFilters: $pf")
    val expected = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(rows == expected)
    // pruning happened at the file-index level: the scan read exactly the
    // files inside lang=en/ and none of the other directories' (inputFiles
    // on the unexecuted relation still lists every file — only the runtime
    // metric proves the prune). Counted from the directory, not assumed to
    // be 1: write parallelism is free to split a partition into several
    // files without that meaning the prune failed.
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    val enFiles = filesUnder("lang=en")
    val allFiles = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(d => filesUnder(d.getName)).sum
    assert(enFiles >= 1 && enFiles < allFiles, s"fixture: $enFiles of $allFiles")
    assert(scan.metrics("numFiles").value == enFiles,
      s"numFiles = ${scan.metrics("numFiles").value}, lang=en has $enFiles")
  }

  test("non-partition predicates still push into the scan under pruning") {
    val q = spark.read.parquet(dir)
      .filter(col("lang") === "en" && col("n_chars") > 200)
    q.count()
    val p = q.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
    assert(pushed.contains("n_chars"), s"n_chars not pushed: $pushed")
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
    assert(pf.contains("lang"), pf)
  }

  test("partitioned round-trip preserves the data exactly") {
    val a = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    val b = spark.read.parquet(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }
}
