package graft.pipeline

import graft.queries.GraphServing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING query serving over the graph-walk pack — the QUERY side of
  * the serving story. [[graft.queries.GraphServing]] gives a warm
  * [[graft.queries.GraphServing.Handle]] that answers repeated BATCH
  * calls; a retrieval deployment receives queries as a STREAM while the
  * maintainer loop ([[IndexSync]], `servingPackDir`) refreshes the pack
  * underneath it. This loop closes that gap:
  *
  *   - every micro-batch of (q_id, q_emb) rows answers through ONE warm
  *     handle, opened once and reused across batches — no per-batch
  *     meta/seed/adjacency re-resolution (each batch stays
  *     broadcast-small by the Handle contract; the pack reads stay
  *     frontier-bucket-pruned);
  *   - results land as epoch-tagged parquet (`outDir/b<epochId>`,
  *     overwrite) — a REPLAYED batch after a crash rewrites the same dir,
  *     so output is exactly-once per stream epoch with no marker state
  *     (the fresh-epoch-dir idempotence idiom of the engine's stores,
  *     applied on the serving side);
  *   - STALENESS-AWARE: before answering, the loop compares the pack's
  *     committed epoch to the handle's and reopens on advance (one meta
  *     listing per batch — never a data read). Queries pick up refreshed
  *     state at the next batch boundary and serving NEVER blocks on
  *     maintenance: readers and the refresh interleave through the
  *     EpochStore commit protocol, exactly as the spec's
  *     serve-while-refreshing case drives it.
  *
  * At 100 TB this is the deployment shape: a query stream (partitioned by
  * tenant/shard) hits a fleet of warm handles; maintenance cost lives
  * entirely in the maintainer's loop, and the serving plan is the same
  * pruned walk [[graft.queries.GraphServing.Handle.topK]] prices in BENCH
  * (`graphsearch_queries_per_s`).
  */
object WalkServe {

  /** Start the serving loop: `queries` is a STREAMING frame with
    * (q_id LONG, q_emb ARRAY<FLOAT>) columns. Each micro-batch's top-`k`
    * lands at `outDir/b<epochId>` with a `batch` column. Returns the
    * handle to stop.
    */
  def start(queries: DataFrame, packDir: String, outDir: String,
      checkpointDir: String, k: Int = 5, triggerMs: Long = 100)(
      implicit spark: SparkSession): StreamingQuery = {
    var handle = GraphServing.open(spark, packDir)
    queries.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // ONE evaluation of the micro-batch: the query batch is
        // broadcast-small by the Handle contract, so collect it here and
        // feed the walk a local relation — emptiness, the served-queries
        // counter, and the walk's own internal collect all come from
        // these rows instead of three separate source re-reads per
        // trigger (a file/Kafka source re-reads its data per evaluation)
        val rows = batch
          .select(org.apache.spark.sql.functions.col("q_id").cast("long"),
            org.apache.spark.sql.functions.col("q_emb").cast("array<float>"))
          .collect()
        if (rows.nonEmpty) {
          val committed = GraphServing.readMeta(spark, packDir).epoch
          if (committed != handle.meta.epoch) {
            // the maintainer advanced the pack — pick it up at this batch
            // boundary; close() releases the superseded handle's pinned
            // seed blocks eagerly instead of waiting out the driver's
            // periodic cleaner GC
            val old = handle
            handle = GraphServing.open(spark, packDir)
            old.close()
            Metrics.global.inc("graft_walkserve_reopens_total")
          }
          import spark.implicits._
          val local = rows.toSeq
            .map(r => (r.getLong(0), r.getSeq[Float](1)))
            .toDF("q_id", "q_emb")
          handle.topK(local, k)
            .withColumn("batch", org.apache.spark.sql.functions.lit(epochId))
            .write.mode("overwrite").parquet(s"$outDir/b$epochId")
          Metrics.global.inc("graft_walkserve_batches_total")
          Metrics.global.inc("graft_walkserve_queries_total",
            rows.map(_.getLong(0)).distinct.length.toLong)
        }
      }
      .start()
  }

  /** Everything served so far (q_id, rnk, vec_id, cos, batch) — the read
    * face over the per-epoch result dirs. Empty (schema-bearing) before
    * the first non-empty batch commits, rather than a path error.
    */
  def results(spark: SparkSession, outDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith("b")).map(_.toString)
    if (dirs.isEmpty)
      spark.range(0).select(
        org.apache.spark.sql.functions.col("id").as("q_id"),
        org.apache.spark.sql.functions.lit(0).as("rnk"),
        org.apache.spark.sql.functions.col("id").as("vec_id"),
        org.apache.spark.sql.functions.lit(0.0).as("cos"),
        org.apache.spark.sql.functions.col("id").as("batch"))
    else spark.read.parquet(dirs: _*)
  }
}
