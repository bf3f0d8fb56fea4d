package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The runnable corpus build — the training-data twin of the sync side's
  * `GraftSync`: compose the catalog's operators into one end-to-end job
  * that takes a raw document table and writes the training corpus.
  *
  *   1. near-dup removal: banded MinHash pairs → large-star/small-star
  *      components → every non-keeper dropped (q_dedup_minhash_pairs +
  *      q_dedup_clusters semantics);
  *   2. deterministic split: the md5 80/10/10 assignment
  *      (q_sample_stratified) — reproducible on any cluster;
  *   3. sequence packing: 512-token budget chunk ids per (lang, split)
  *      stream (q_pack_chunks semantics, keyed by the output partition);
  *   4. layout: Hive-partitioned parquet by (lang, split) so a training
  *      reader's `lang=en/split=train` scan is partition-pruned I/O.
  *
  * Every stage is the already-oracle-checked operator — this class only
  * composes them; CorpusBuildSpec ties the written output back to the
  * q_corpus_final manifest counts.
  */
object CorpusBuild {

  /** Run the build; returns per-(lang, split) kept-document counts. */
  def run(spark: SparkSession, sfDir: String, outDir: String): Map[(String, String), Long] = {
    val docs = Tables.documents(spark, sfDir)
    val edges = TextQueries.minhashPairs(spark, sfDir).select("a_id", "b_id")
    val drops = CorpusQueries.connectedComponents(edges)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    // no broadcast hint: the drop set scales with the corpus's duplicate
    // mass, not with cluster count — let the planner (AQE) pick shuffle vs
    // broadcast from its actual size. Chunk ids come from the two-phase
    // blocked prefix sum (CorpusQueries.withTokensBefore) keyed by the
    // output partition — never one window task per (lang, split). The
    // helper localCheckpoints its input, so it gets only the NARROW
    // (doc_id, lang, split, n_tokens) projection — materializing the full
    // text column a second time would roughly double the job's I/O at the
    // design scale — and the chunk ids join back on doc_id.
    val enriched = docs
      .join(drops, Seq("doc_id"), "left_anti")
      .withColumn("split", CorpusQueries.splitCol)
      .withColumn("n_tokens", size(tokens(col("text"))))
    // the helper's checkpoint already holds (doc_id, split, n_tokens), so
    // the write joins RAW docs against it — re-joining `enriched` would
    // re-run the anti-join and re-tokenize the whole corpus a second
    // time; chunkIds' doc_id set IS the kept set, so the inner join also
    // re-applies the drop filter for free
    val chunkIds = CorpusQueries.withTokensBefore(
        enriched.select("doc_id", "lang", "split", "n_tokens"),
        Seq("lang", "split"))
      .withColumn("chunk_id", floor(col("tokens_before") / 512.0))
      .select("doc_id", "split", "n_tokens", "chunk_id")
    val kept = docs.join(chunkIds, "doc_id")
    kept.write.mode("overwrite").partitionBy("lang", "split").parquet(outDir)
    // counts come from re-READING the written layout (proving the write,
    // not the plan); an all-empty corpus writes no partition directories,
    // which parquet cannot infer a schema from — that IS the empty manifest
    try
      spark.read.parquet(outDir)
        .groupBy("lang", "split").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
        Map.empty
    }
  }

  /** `runMain graft.queries.CorpusBuild [outDir]` over SPARK_GRAFT_SF_DIR;
    * prints one JSON summary line.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_corpus").toString)
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
      val counts = run(spark, sfDir, outDir)
      val parts = counts.toSeq.sortBy(_._1)
        .map { case ((l, s), n) => s""""$l/$s":$n""" }.mkString("{", ",", "}")
      println(s"""{"corpus":"$outDir","kept":${counts.values.sum},"partitions":$parts}""")
    } finally spark.stop()
  }
}
