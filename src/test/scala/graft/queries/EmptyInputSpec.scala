package graft.queries

import graft.{SparkSpec, Tables}

/** Adversarial robustness: every catalog query must run on EMPTY tables
  * without throwing. At warehouse scale empty inputs are not exotic — a
  * partition-pruned scan, a filter that matches nothing, or a fresh tenant
  * all hand every downstream operator zero rows, and an engine that
  * NPEs/divides-by-zero/head()s its way through them is broken regardless
  * of how it behaves on data. Iterative operators (k-means, label
  * propagation, PQ) are the usual offenders: their driver-side loops must
  * converge, not crash, on nothing.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { t =>
      // read the RAW parquet (no ts rewrite) so the written schema matches
      // what Tables.* expects to find on disk
      spark.read.parquet(Tables.path(sf001, t))
        .limit(0)
        .write.mode("overwrite").parquet(Tables.path(dir, t))
    }
    dir
  }

  test("every catalog query tolerates zero-row inputs") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
