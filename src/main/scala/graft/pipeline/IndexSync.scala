package graft.pipeline

import graft.pipeline.VectorSync.VecEvent
import graft.queries.{IndexedLayout, KnnGraphBuild}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The engine's NAMESAKE loop, end to end: a streaming CDC of vector
  * upserts/deletes keeps the PHYSICAL ANN state fresh — the cell-partitioned
  * [[IndexedLayout]] and/or the persisted k-NN graph ([[KnnGraphBuild]]) —
  * exactly what the reference's A1→A17 pipeline does for metadata
  * (cmd/main.go:106-182), applied to the index itself. [[VectorSync]]
  * remains the store-sync half; this drives the index half from the same
  * event shape.
  *
  * Per micro-batch: last-state-wins per vec_id by event_seq (the A13
  * contract inside an epoch), then one [[IndexedLayout.applyDelta]] epoch
  * (tombstones + fresh cell files) and one graph round —
  * [[KnnGraphBuild.deleteVecs]] for deletes plus superseded upserts, then
  * the method-matching delta for the fresh vectors. Both stores commit
  * through their own epoch markers, so a crash anywhere retries into
  * convergence:
  *   - a crashed, uncommitted store epoch is invisible and the retry
  *     rewrites it (each store's own crash-safety contract);
  *   - a replay of an ALREADY-committed application (the foreachBatch
  *     epoch re-runs after recovery) is skipped via the per-store stream
  *     markers below — and even a marker lost to a crash merely re-applies
  *     an idempotent delta (newer tombstones kill the earlier copy;
  *     IndexedLayoutDeleteSpec / IndexSyncSpec prove convergence).
  *
  * Bootstrap: run [[IndexedLayout.write]] / [[KnnGraphBuild.build*]] over
  * the initial corpus first; this query then maintains that state. The
  * per-trigger event batch is bounded by keys changed per trigger (the
  * VectorSync contract), so the driver-side collect is delta-sized.
  */
object IndexSync {

  /** Marker dir recording which stream epochs a store already absorbed —
    * `<stateDir>/stream/e<epochId>` (an empty file per applied epoch).
    * Written AFTER the store's own epoch committed; purely a replay
    * short-circuit, never the correctness mechanism.
    */
  private def markerPath(stateRoot: String, epochId: Long) =
    new org.apache.hadoop.fs.Path(s"$stateRoot/stream/e$epochId")

  private def marked(spark: SparkSession,
      stateRoot: String, epochId: Long): Boolean = {
    val p = markerPath(stateRoot, epochId)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def mark(spark: SparkSession,
      stateRoot: String, epochId: Long): Unit = {
    val p = markerPath(stateRoot, epochId)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Apply one epoch's events to the layout and/or graph (either dir may
    * be null to maintain just one). Exposed for the spec's replay test;
    * [[start]] drives it per micro-batch. Returns (upserts, deletes)
    * applied — (0, 0) when every target store had already absorbed the
    * epoch.
    */
  def applyBatch(spark: SparkSession, events: Seq[VecEvent], epochId: Long,
      layoutDir: String, graphDir: String): (Long, Long) = {
    import spark.implicits._
    if (events.isEmpty) return (0L, 0L)
    // last state wins inside the epoch (A13): one surviving verb per key
    val last = events.groupBy(_.vec_id).map(_._2.maxBy(_.event_seq)).toSeq
    val dels = last.filter(_.event_type == "DELETE").map(_.vec_id)
    val ups = last.filterNot(_.event_type == "DELETE")
    val upDf = ups.map(e => (e.vec_id, e.embedding))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
    val delDf = dels.toDF("vec_id")
    var applied = false
    if (layoutDir != null && !marked(spark, s"$layoutDir/_index", epochId)) {
      IndexedLayout.applyDelta(spark, upDf, delDf, layoutDir)
      mark(spark, s"$layoutDir/_index", epochId)
      applied = true
    }
    if (graphDir != null &&
        !marked(spark, s"$graphDir/_graft_state", epochId)) {
      // tombstone deletes AND superseded upsert copies, then re-insert the
      // fresh vectors through the method-matching delta (upsert = delete +
      // insert; deleteVecs is tolerant of ids that are not live)
      KnnGraphBuild.deleteVecs(spark,
        delDf.union(upDf.select("vec_id")), graphDir)
      if (ups.nonEmpty) {
        val method = KnnGraphBuild.methodOf(spark, graphDir)
        if (method == "ivf") KnnGraphBuild.deltaIvf(spark, upDf, graphDir)
        else KnnGraphBuild.delta(spark, upDf, graphDir)
      }
      mark(spark, s"$graphDir/_graft_state", epochId)
      applied = true
    }
    if (applied) (ups.size.toLong, dels.size.toLong) else (0L, 0L)
  }

  /** Maintain the physical index state from a CDC stream — the streaming
    * face of [[applyBatch]]. Same exactly-once shape as [[VectorSync]]:
    * checkpointed offsets + idempotent epoch application.
    */
  def start(
      events: Dataset[VecEvent],
      layoutDir: String,
      graphDir: String,
      checkpointDir: String,
      triggerMs: Long = 100)(implicit spark: SparkSession): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[VecEvent], epochId: Long) =>
        applyBatch(spark, batch.collect().toSeq, epochId, layoutDir, graphDir)
        ()
      }
      .start()
}
