package graft.pipeline

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic coverage of the debounce transition function — the same
  * invariants the reference asserts in debounce_test.go (delete bypass :33,
  * last-state-wins :109, delete-cancels-pending :161, payload separation
  * :267) without any streaming machinery.
  */
class DebounceSpec extends AnyFunSuite {

  private def ev(id: String, typ: String, seq: Long, label: String = ""): ResourceEventRow =
    ResourceEventRow(typ, seq, new Timestamp(seq * 1000), id, "default", id,
      "Deployment", "apps/v1", "apps", Map("version" -> label), null,
      new Timestamp(0))

  test("upserts are held (armed), not emitted, until the timer fires") {
    val (state, out, arm) = Debounce.applyEvents(None, Seq(ev("a", "ADD", 1)))
    assert(out.isEmpty)
    assert(arm)
    assert(state.exists(_.seq == 1))
  }

  test("last-state-wins: newest event replaces pending (debounce_test.go:109)") {
    val events = (1L to 5L).map(i => ev("rapid-app", "UPDATE", i, s"v$i"))
    val (state, out, _) = Debounce.applyEvents(None, events)
    assert(out.isEmpty)
    assert(state.get.row.labels == Map("version" -> "v5"))
    // out-of-order arrival: older seq never overwrites newer
    val (state2, _, _) = Debounce.applyEvents(state, Seq(ev("rapid-app", "UPDATE", 3, "v3")))
    assert(state2.get.row.labels == Map("version" -> "v5"))
  }

  test("delete bypasses debounce and cancels pending upsert (debounce_test.go:33,:161)") {
    val (pending, _, _) = Debounce.applyEvents(None, Seq(ev("a", "ADD", 1)))
    val (state, out, arm) = Debounce.applyEvents(pending, Seq(ev("a", "DELETE", 2)))
    assert(out == List(SyncAction.delete("a")))
    assert(state.exists(_.tombstone)) // pending upsert cancelled, tombstone left
    assert(arm) // timer re-armed to evict the tombstone
  }

  test("a stale out-of-order DELETE loses to a newer pending upsert (seq order wins)") {
    // last-state-wins is by event_seq for ALL event types: if the pending
    // upsert is newer than a reordered delete, the true latest state is the
    // upsert, so the delete is ignored (the mirror of tombstone-vs-stale-ADD)
    val (pending, _, _) = Debounce.applyEvents(None, Seq(ev("a", "ADD", 5, "new")))
    val (state, out, applied) = Debounce.applyEvents(pending, Seq(ev("a", "DELETE", 3)))
    assert(out.isEmpty)
    assert(state.exists(p => !p.tombstone && p.seq == 5))
    // discarded events are NOT "applied" — the stateFunc keeps the original
    // flush deadline instead of re-extending the debounce window
    assert(!applied)
  }

  test("a stale-only micro-batch restores the remaining window, not a fresh one") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.{Optional => JOptional}
    val debounceMs = 5000L
    // t=1000: ADD seq 5 accepted → deadline 6000
    val s1 = TestGroupState.create[Debounce.Pending](
      JOptional.empty[Debounce.Pending](), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, JOptional.empty[Long](), hasTimedOut = false)
    Debounce.stateFunc(debounceMs)("a", Iterator(ev("a", "ADD", 5)), s1).toList
    assert(s1.getTimeoutTimestampMs.get() == 6000L)
    // t=3000: stale DELETE seq 3 discarded → deadline must STAY 6000
    val s2 = TestGroupState.create[Debounce.Pending](
      JOptional.of(s1.get), GroupStateTimeout.ProcessingTimeTimeout,
      3000L, JOptional.empty[Long](), hasTimedOut = false)
    Debounce.stateFunc(debounceMs)("a", Iterator(ev("a", "DELETE", 3)), s2).toList
    assert(s2.getTimeoutTimestampMs.get() == 6000L)
    // t=3000: accepted UPDATE seq 6 → deadline re-extends to 8000
    val s3 = TestGroupState.create[Debounce.Pending](
      JOptional.of(s2.get), GroupStateTimeout.ProcessingTimeTimeout,
      3000L, JOptional.empty[Long](), hasTimedOut = false)
    Debounce.stateFunc(debounceMs)("a", Iterator(ev("a", "UPDATE", 6)), s3).toList
    assert(s3.getTimeoutTimestampMs.get() == 8000L)
  }

  test("a late out-of-order upsert cannot resurrect a deleted key across batches") {
    val (afterDelete, _, _) = Debounce.applyEvents(None, Seq(ev("a", "DELETE", 5)))
    // cross-batch reorder: an older ADD (seq 3) arrives after the delete
    val (state, out, _) = Debounce.applyEvents(afterDelete, Seq(ev("a", "ADD", 3, "stale")))
    assert(out.isEmpty)
    assert(state.exists(_.tombstone)) // stale ADD ignored, tombstone holds
    // a genuinely newer ADD does re-create the key
    val (state2, _, arm2) = Debounce.applyEvents(state, Seq(ev("a", "ADD", 6, "fresh")))
    assert(state2.exists(p => !p.tombstone && p.row.labels("version") == "fresh"))
    assert(arm2)
  }

  test("add-after-delete within one batch re-pends the key") {
    val (state, out, arm) = Debounce.applyEvents(None,
      Seq(ev("a", "ADD", 1), ev("a", "DELETE", 2), ev("a", "ADD", 3, "re")))
    assert(out == List(SyncAction.delete("a")))
    assert(state.get.row.labels == Map("version" -> "re"))
    assert(arm)
  }

  test("A10: an UPDATE whose labels/annotations did not change is suppressed at flush") {
    val (s1, _, _) = Debounce.applyEvents(None, Seq(ev("a", "ADD", 1, "v1")))
    val (s2, e1) = Debounce.onTimeout(s1.get)
    assert(e1.exists(_.action == SyncAction.Upsert))
    assert(s2.exists(_.flushed)) // last-sent row retained as suppression memory
    // identical UPDATE (same labels/annotations) → held, then dropped at flush
    val (s3, out3, arm3) = Debounce.applyEvents(s2, Seq(ev("a", "UPDATE", 2, "v1")))
    assert(out3.isEmpty && arm3)
    val (s4, e2) = Debounce.onTimeout(s3.get)
    assert(e2.isEmpty) // no-op upsert dropped (watcher.go:315-331)
    // changed labels → second upsert
    val (s5, _, _) = Debounce.applyEvents(s4, Seq(ev("a", "UPDATE", 3, "v2")))
    val (_, e3) = Debounce.onTimeout(s5.get)
    assert(e3.exists(_.instance.exists(_.labels("version") == "v2")))
  }

  test("A10 gates UPDATEs only: an identical ADD still flushes (watcher.go gates UpdateFunc)") {
    val (s1, _, _) = Debounce.applyEvents(None, Seq(ev("a", "ADD", 1, "v1")))
    val (s2, _) = Debounce.onTimeout(s1.get)
    val (s3, _, _) = Debounce.applyEvents(s2, Seq(ev("a", "ADD", 2, "v1")))
    val (_, e) = Debounce.onTimeout(s3.get)
    assert(e.exists(_.action == SyncAction.Upsert)) // resync replay must re-send
  }

  test("A10 memory clears on delete: the first post-delete upsert always sends") {
    val (s1, _, _) = Debounce.applyEvents(None, Seq(ev("a", "ADD", 1, "v1")))
    val (s2, _) = Debounce.onTimeout(s1.get)
    val (s3, del, _) = Debounce.applyEvents(s2, Seq(ev("a", "DELETE", 2)))
    assert(del == List(SyncAction.delete("a")))
    val (s4, none) = Debounce.onTimeout(s3.get) // tombstone evicts fully
    assert(s4.isEmpty && none.isEmpty)
    val (s5, _, _) = Debounce.applyEvents(s4, Seq(ev("a", "UPDATE", 3, "v1")))
    val (_, e) = Debounce.onTimeout(s5.get)
    assert(e.exists(_.action == SyncAction.Upsert))
  }

  test("payloads never mix upserts and deletes (debounce_test.go:267)") {
    val actions = Seq(
      SyncAction.upsert(ev("a", "ADD", 1)),
      SyncAction.delete("b"),
      SyncAction.upsert(ev("c", "ADD", 2)),
      SyncAction.delete("d"))
    val payloads = Payloads.fromActions(actions, maxBatch = 50)
    assert(payloads.size == 2)
    assert(payloads.head == """{"deletes":["b","d"]}""")
    assert(payloads(1).startsWith("""{"upserts":["""))
    assert(!payloads(1).contains("deletes"))
  }

  test("upserts chunk at maxBatch (config.go:50)") {
    val actions = (1 to 120).map(i => SyncAction.upsert(ev(s"k$i", "ADD", i.toLong)))
    val payloads = Payloads.fromActions(actions, maxBatch = 50)
    assert(payloads.size == 3) // 50 + 50 + 20
  }

  test("config loads from env with reference defaults; CSV normalizes (config.go)") {
    val defaults = SyncPipeline.Config.fromEnv(Map.empty)
    assert(defaults.debounceMs == 10000L) // DEBOUNCE_WINDOW_MS default
    assert(defaults.maxBatch == 50) // BATCH_MAX_SIZE default
    val custom = SyncPipeline.Config.fromEnv(Map(
      "DEBOUNCE_WINDOW_MS" -> "250", "BATCH_MAX_SIZE" -> "7",
      "BATCH_FLUSH_INTERVAL_MS" -> "nonsense")) // bad value → default
    assert(custom.debounceMs == 250L && custom.maxBatch == 7)
    assert(custom.flushIntervalMs == 500L)
    assert(SyncPipeline.Config.parseCsv(" Pods, SECRETS ,,events ")
      == Seq("pods", "secrets", "events"))
  }

  test("config covers the full reference env surface (A20, config.go:44-57)") {
    val defaults = SyncPipeline.Config.fromEnv(Map.empty)
    assert(defaults.instancesEndpoint == SyncPipeline.Config.DefaultInstancesEndpoint)
    assert(defaults.capabilitiesEndpoint == "" && !defaults.crdPipelineEnabled)
    assert(defaults.resyncIntervalMin == 1440L)
    assert(defaults.watchResourceTypes.isEmpty)
    assert(defaults.excludeResourceTypes == SyncPipeline.Config.DefaultExcludes)
    assert(defaults.apiBindAddress == ":8082" && defaults.logLevel == "info")
    val custom = SyncPipeline.Config.fromEnv(Map(
      "INSTANCES_ENDPOINT" -> "http://sink:3000/api/v1/instances/sync",
      "CAPABILITIES_ENDPOINT" -> "http://sink:3000/api/v1/capabilities/sync",
      "RESYNC_INTERVAL_MIN" -> "30",
      "WATCH_RESOURCE_TYPES" -> "Pods, Deployments",
      "EXCLUDE_RESOURCE_TYPES" -> "secrets",
      "API_BIND_ADDRESS" -> ":9999",
      "LOG_LEVEL" -> "debug"))
    assert(custom.crdPipelineEnabled && custom.resyncIntervalMin == 30L)
    assert(custom.watchResourceTypes == Seq("pods", "deployments"))
    assert(custom.excludeResourceTypes == Seq("secrets"))
    assert(custom.apiBindAddress == ":9999" && custom.logLevel == "debug")
  }

  test("A21: CRDs are force-watched whenever the capabilities pipeline is on") {
    val caps = "http://sink:3000/api/v1/capabilities/sync"
    // allowlist without CRDs → CRD type force-appended (watcher.go:198-205)
    val allow = SyncPipeline.Config(
      watchResourceTypes = Seq("pods"), capabilitiesEndpoint = caps)
    assert(allow.effectiveWatchTypes == Seq("pods", "customresourcedefinitions"))
    // blocklist mode (default excludes LIST CRDs) → still watched via bypass
    val block = SyncPipeline.Config(capabilitiesEndpoint = caps)
    assert(block.effectiveWatchTypes == Seq("*", "customresourcedefinitions"))
    // capabilities off → no force-add, blocklist applies as-is
    assert(SyncPipeline.Config().effectiveWatchTypes == Seq("*"))
  }


  test("instance JSON matches the wire contract shape (README.md:135-154)") {
    val row = ResourceEventRow("ADD", 1, new Timestamp(0),
      "default/apps/v1/Deployment/nginx", "default", "nginx", "Deployment",
      "apps/v1", "apps", Map("app" -> "nginx"),
      Map("description" -> "Main web server"),
      Timestamp.valueOf("2026-02-20 10:00:00"))
    val json = Payloads.instanceJson(row)
    assert(json.contains(""""id":"default/apps/v1/Deployment/nginx""""))
    assert(json.contains(""""labels":{"app":"nginx"}"""))
    assert(json.contains(""""createdAt":"2026-02-20T10:00:00Z""""))
    // null annotations serialize as null, not {} (extract.go:84-101)
    assert(Payloads.instanceJson(row.copy(annotations = null))
      .contains(""""annotations":null"""))
  }
}
