package graft.pipeline

import java.sql.Timestamp

/** Typed rows for the sync pipeline.
  *
  * `ResourceEventRow` mirrors the reference's `ResourceEvent` + flattened
  * `ResourceInstance` (watcher.go:28-38, extract.go:12-27; FIXTURES.md §1.1):
  * a keyed CDC stream with event_type ∈ {ADD, UPDATE, DELETE}. `event_seq` is
  * the total order per key (replaces wall-clock arrival order in tests).
  */
final case class ResourceEventRow(
    event_type: String,
    event_seq: Long,
    ts: Timestamp,
    id: String,
    namespace: String,
    name: String,
    kind: String,
    apiVersion: String,
    apiGroup: String,
    labels: Map[String, String],
    annotations: Map[String, String],
    createdAt: Timestamp)

/** What the debounce operator emits downstream: an immediate delete or a
  * quiesced upsert (reference: debounce.go:104-149). Exactly one of
  * `instance` (upsert) is defined when action == "upsert".
  */
final case class SyncAction(
    action: String, // "upsert" | "delete"
    id: String,
    instance: Option[ResourceEventRow])

object SyncAction {
  val Upsert = "upsert"
  val Delete = "delete"
  def upsert(row: ResourceEventRow): SyncAction = SyncAction(Upsert, row.id, Some(row))
  def delete(id: String): SyncAction = SyncAction(Delete, id, None)
}
