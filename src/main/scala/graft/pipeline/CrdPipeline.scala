package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** The CRD capabilities pipeline — the reference's second, name-keyed stream
  * (watcher.go:41-44, crd_debounce.go; SURVEY.md A11): same
  * debounce/dedup/delete-bypass semantics as the instance pipeline but keyed
  * by fully-qualified CRD name, with two contract differences:
  *
  *   - CRD UPDATE events are dropped at the router (watcher.go:240-243,
  *     prds/done/5-crd-change-detection.md:175) — only ADD/DELETE flow.
  *   - Payloads carry bare name strings, not instance objects
  *     (crd_debounce.go:16-19): {"upserts":["<plural>.<group>"...]} /
  *     {"deletes":[...]}.
  */
object CrdPipeline {

  final case class CrdEventRow(
      event_type: String, event_seq: Long, ts: Timestamp, crd_name: String)

  final case class CrdAction(action: String, crd_name: String)

  final case class Pending(seq: Long, tombstone: Boolean = false)

  /** Same keyed-state shape as Debounce.stateFunc, over names: tombstones
    * block cross-batch out-of-order resurrection and expire via timeout.
    */
  def stateFunc(debounceMs: Long)(
      name: String,
      events: Iterator[CrdEventRow],
      state: GroupState[Pending]): Iterator[CrdAction] = {
    if (state.hasTimedOut) {
      val emit = state.getOption.filterNot(_.tombstone)
        .map(_ => CrdAction(SyncAction.Upsert, name))
      state.remove()
      emit.iterator
    } else {
      var out = List.empty[CrdAction]
      events.toSeq.sortBy(_.event_seq).foreach { e =>
        if (state.getOption.forall(_.seq < e.event_seq)) {
          if (e.event_type == "DELETE") {
            state.update(Pending(e.event_seq, tombstone = true))
            out ::= CrdAction(SyncAction.Delete, name)
          } else if (e.event_type == "ADD") {
            state.update(Pending(e.event_seq))
          } // UPDATE dropped (watcher.go:240-243)
        }
      }
      if (state.exists) state.setTimeoutDuration(debounceMs)
      out.reverse.iterator
    }
  }

  def debounced(events: Dataset[CrdEventRow], debounceMs: Long)(
      implicit spark: SparkSession): Dataset[CrdAction] = {
    import spark.implicits._
    events
      .filter(_.event_type != "UPDATE")
      .groupByKey(_.crd_name)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout)(stateFunc(debounceMs))
  }

  /** Name payloads: deletes first (fast path), upserts chunked — same
    * split/chunk/escape contract as the instance pipeline (Payloads.build).
    */
  def payloads(actions: Seq[CrdAction], maxBatch: Int = 50): Seq[String] = {
    val (dels, ups) = actions.partition(_.action == SyncAction.Delete)
    Payloads.build(
      dels.map(a => Payloads.jstr(a.crd_name)),
      ups.map(a => Payloads.jstr(a.crd_name)),
      maxBatch)
  }

  def start(
      events: Dataset[CrdEventRow],
      sink: RestSink,
      config: SyncPipeline.Config = SyncPipeline.Config())(
      implicit spark: SparkSession): StreamingQuery = {
    SyncPipeline.applyStateStoreConf(spark, config)
    val actions = debounced(events, config.debounceMs)
    val maxBatch = config.maxBatch
    val writer = actions.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(config.flushIntervalMs))
      .foreachBatch { (batch: Dataset[CrdAction], _: Long) =>
        if (config.executorSideSink)
          // same per-partition sender tradeoff as SyncPipeline.start: no
          // driver round-trip; per-name order preserved (one state partition)
          batch.foreachPartition { (it: Iterator[CrdAction]) =>
            Payloads.deliver(sink, payloads(it.toSeq, maxBatch))
          }
        else
          Payloads.deliver(sink, payloads(batch.collect().toSeq, maxBatch))
      }
    val w =
      if (config.checkpointDir.nonEmpty)
        writer.option("checkpointLocation", config.checkpointDir)
      else writer
    w.start()
  }
}
