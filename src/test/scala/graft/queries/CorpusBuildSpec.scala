package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The end-to-end corpus build vs its constituent oracles: written
  * partition counts must equal the q_corpus_final manifest, the layout
  * must be Hive-partitioned by (lang, split), and chunk ids must be
  * monotone within every partition stream.
  */
class CorpusBuildSpec extends SparkSpec {

  private lazy val out = {
    val d = java.nio.file.Files.createTempDirectory("corpus_build").toString
    CorpusBuild.run(spark, sf001, d)
    d
  }

  test("written counts equal the q_corpus_final manifest") {
    val manifest = graft.SparkEntry.queries("q_corpus_final")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val written = spark.read.parquet(out)
      .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(written == manifest)
  }

  test("the layout is Hive-partitioned by lang then split") {
    val top = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).toSeq
    assert(top.nonEmpty, new java.io.File(out).listFiles().map(_.getName).toSeq)
    val splits = new java.io.File(s"$out/${top.head}").listFiles()
      .map(_.getName).filter(_.startsWith("split=")).toSeq
    assert(splits.nonEmpty, splits)
  }

  test("an empty corpus builds an empty manifest, not an error") {
    val emptyDir = java.nio.file.Files.createTempDirectory("corpus_empty_in").toString
    graft.Tables.names.foreach { t =>
      spark.read.parquet(graft.Tables.path(sf001, t))
        .limit(0).write.mode("overwrite").parquet(graft.Tables.path(emptyDir, t))
    }
    val out = java.nio.file.Files.createTempDirectory("corpus_empty_out").toString
    val counts = CorpusBuild.run(spark, emptyDir, out)
    assert(counts.isEmpty, counts)
  }

  test("delta build ≡ full rebuild on the same data") {
    // split the corpus at the median id: base build, then the rest as an
    // append-only delta — output must match one full build over everything
    val docs = graft.Tables.documents(spark, sf001)
    val mid = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong
    val cols = Seq("doc_id", "lang", "split", "n_tokens", "chunk_id")

    val outDelta = java.nio.file.Files.createTempDirectory("corpus_delta").toString
    CorpusBuild.build(spark, docs.filter(col("doc_id") <= mid), outDelta)
    val deltaCounts = CorpusBuild.runDelta(
      spark, docs.filter(col("doc_id") > mid), outDelta)

    val fullCounts = spark.read.parquet(out)
      .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(deltaCounts == fullCounts)
    def canon(dir: String) = spark.read.parquet(dir)
      .select(cols.map(col): _*).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(outDelta) == canon(out))
  }

  test("signature state covers every doc seen, dropped ones included") {
    // a later delta doc whose nearest duplicate was itself DROPPED must
    // still find that doc's component — so the state must hold all-seen
    // signatures, not kept-only ones
    val total = graft.Tables.documents(spark, sf001).count()
    assert(spark.read.parquet(s"$out/_graft_state/sigs").count() == total)
    val kept = spark.read.parquet(out).count()
    assert(kept < total) // the corpus HAS dropped docs, so the check bites
  }

  test("delta rejects doc_ids at or below the stored high-water mark") {
    val docs = graft.Tables.documents(spark, sf001)
    val d = java.nio.file.Files.createTempDirectory("corpus_hwm").toString
    CorpusBuild.build(spark, docs, d)
    val e = intercept[IllegalArgumentException] {
      CorpusBuild.runDelta(spark, docs.limit(10), d)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("a crashed delta is detected by the signature-count integrity gate") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val mid = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong
    val d = java.nio.file.Files.createTempDirectory("corpus_crash").toString
    CorpusBuild.build(spark, docs.filter(col("doc_id") <= mid), d)
    // simulate: a delta advanced the mark + expected count, then died
    // before its signature append — meta promises rows the state lacks
    val meta = spark.read.parquet(s"$d/_graft_state/meta").head
    Seq((meta.getAs[Long]("max_doc_id") + 1000, meta.getAs[Long]("n_sigs") + 10))
      .toDF("max_doc_id", "n_sigs")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/_graft_state/meta")
    val e = intercept[IllegalArgumentException] {
      CorpusBuild.runDelta(spark, docs.filter(col("doc_id") > mid)
        .withColumn("doc_id", col("doc_id") + 100000), d)
    }
    assert(e.getMessage.contains("state integrity"))
  }

  test("chunk ids are monotone non-decreasing along each partition's doc order") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang", "split").orderBy("doc_id")
    val bad = spark.read.parquet(out)
      .withColumn("prev", lag("chunk_id", 1).over(w))
      .filter(col("prev").isNotNull && col("chunk_id") < col("prev"))
    assert(bad.isEmpty)
  }
}
