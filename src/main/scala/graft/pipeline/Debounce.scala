package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key debounce with last-state-wins and delete fast-path — the
  * reference's three hardest semantics (debounce.go:104-149, A12-A14) in one
  * keyed state function:
  *
  *   - A12 debounce: an upsert is held until its key has been quiet for the
  *     debounce window; any newer event for the key resets the timer.
  *   - A13 last-state-wins: a newer pending upsert replaces the older one —
  *     exactly one (the final) upsert is ever emitted per quiet period.
  *   - A14 delete bypass + cancel: DELETE skips the debounce entirely (emitted
  *     in its own micro-batch, bounded by the trigger interval, matching the
  *     reference's <1 s assertion) and cancels any pending upsert for the key.
  *
  * The reference needs a generation counter to guard timer races
  * (debounce.go:53-58); here the state store serializes per-key access, so the
  * race cannot exist — `GroupState` + ProcessingTimeTimeout replaces
  * `time.AfterFunc` + mutex + generation.
  *
  * Scale: state is hash-partitioned by id across executors (the shuffle before
  * the stateful operator is the only exchange), per-key state is one row, and
  * eviction is deterministic (emit-on-timeout removes state), so state size is
  * bounded by the number of keys *currently inside a debounce window* — not by
  * stream history. RocksDB state store handles spill at the 100 TB design
  * point.
  */
object Debounce {

  /** Per-key state: a pending (not yet quiesced) upsert, or a tombstone left
    * behind by a DELETE. The tombstone carries the delete's seq so an
    * older-seq upsert arriving in a LATER micro-batch (cross-batch reorder)
    * cannot resurrect the deleted key; it expires via the same timeout that
    * flushes upserts, so state stays bounded.
    */
  final case class Pending(row: ResourceEventRow, seq: Long, tombstone: Boolean = false)

  /** Pure per-key transition: fold a batch of events for one key into the
    * (new state, emissions, arm-timer?) triple. Unit-testable without Spark.
    *
    * Events are applied in `event_seq` order. A DELETE cancels pending state
    * and emits immediately (leaving a tombstone); upserts replace pending
    * (keeping the max seq) and arm the quiet-period timer.
    */
  def applyEvents(
      pending: Option[Pending],
      events: Seq[ResourceEventRow]): (Option[Pending], List[SyncAction], Boolean) = {
    var state = pending
    var out = List.empty[SyncAction]
    events.sortBy(_.event_seq).foreach { e =>
      if (state.forall(_.seq < e.event_seq)) {
        if (e.event_type == "DELETE") {
          // cancel pending upsert (debounce.go:108-114), remember the seq
          state = Some(Pending(e, e.event_seq, tombstone = true))
          out ::= SyncAction.delete(e.id)
        } else {
          state = Some(Pending(e, e.event_seq))
        }
      }
    }
    (state, out.reverse, state.isDefined)
  }

  /** GroupState wrapper: timeout fires after `debounceMs` of per-key quiet;
    * each new event re-arms it (timer reset, debounce.go:139-147).
    */
  def stateFunc(debounceMs: Long)(
      id: String,
      events: Iterator[ResourceEventRow],
      state: GroupState[Pending]): Iterator[SyncAction] = {
    if (state.hasTimedOut) {
      // quiesced upsert flushes; an expired tombstone just evicts
      val emit = state.getOption.filterNot(_.tombstone).map(p => SyncAction.upsert(p.row))
      state.remove()
      emit.iterator
    } else {
      val (next, out, arm) = applyEvents(state.getOption, events.toSeq)
      next match {
        case Some(p) => state.update(p)
        case None    => if (state.exists) state.remove()
      }
      if (arm) state.setTimeoutDuration(debounceMs)
      out.iterator
    }
  }

  /** The streaming operator: keyed CDC stream → debounced SyncAction stream.
    * The groupByKey(id) hash-partitions by key — the pipeline's one shuffle.
    */
  def apply(events: Dataset[ResourceEventRow], debounceMs: Long)(
      implicit spark: SparkSession): Dataset[SyncAction] = {
    import spark.implicits._
    events
      .groupByKey(_.id)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout)(stateFunc(debounceMs))
  }
}
