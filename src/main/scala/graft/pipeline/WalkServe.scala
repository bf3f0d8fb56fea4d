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
        if (!batch.isEmpty) {
          val committed = GraphServing.readMeta(spark, packDir).epoch
          if (committed != handle.meta.epoch) {
            // the maintainer advanced the pack — pick it up at this batch
            // boundary; the superseded handle needed no teardown (its
            // state was pinned seeds + a resolved reader, nothing held)
            handle = GraphServing.open(spark, packDir)
            Metrics.global.inc("graft_walkserve_reopens_total")
          }
          handle.topK(batch.select("q_id", "q_emb"), k)
            .withColumn("batch", org.apache.spark.sql.functions.lit(epochId))
            .write.mode("overwrite").parquet(s"$outDir/b$epochId")
          Metrics.global.inc("graft_walkserve_batches_total")
          Metrics.global.inc("graft_walkserve_queries_total",
            batch.select("q_id").distinct().count())
        }
      }
      .start()
  }

  /** Everything served so far (q_id, rnk, vec_id, cos, batch) — the read
    * face over the per-epoch result dirs.
    */
  def results(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/b*")
}
