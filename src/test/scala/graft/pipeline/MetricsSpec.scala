package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.net.{HttpURLConnection, URI}
import scala.io.Source

/** The metrics surface (metrics-bind-address analog): counters increment at
  * the delivery/resync seams and GET /metrics serves the Prometheus text
  * exposition. Assertions are deltas against the process-global registry —
  * other suites in the JVM may have counted before this one runs.
  */
class MetricsSpec extends AnyFunSuite {

  private def delta[A](names: String*)(body: => A): Map[String, Long] = {
    val before = names.map(n => n -> Metrics.global.value(n)).toMap
    body
    names.map(n => n -> (Metrics.global.value(n) - before(n))).toMap
  }

  private val okSink = new RestSink(post = _ => 200, sleep = _ => (), jitter = () => 1.0)

  test("deliver counts delivered, dropped, and failed payloads") {
    val d1 = delta("graft_payloads_delivered_total") {
      Payloads.deliver(okSink, Seq("""{"a":1}""", """{"b":2}"""))
    }
    assert(d1("graft_payloads_delivered_total") == 2)
    val badSink = new RestSink(post = _ => 400, sleep = _ => (), jitter = () => 1.0)
    val d2 = delta("graft_payloads_dropped_total") {
      Payloads.deliver(badSink, Seq("""{"a":1}"""))
    }
    assert(d2("graft_payloads_dropped_total") == 1)
    val downSink = new RestSink(post = _ => 503, sleep = _ => (), jitter = () => 1.0)
    val d3 = delta("graft_payload_failures_total") {
      intercept[java.io.IOException](Payloads.deliver(downSink, Seq("""{"a":1}""")))
    }
    assert(d3("graft_payload_failures_total") == 1)
  }

  test("fromActions counts upserts and deletes") {
    val ts = new java.sql.Timestamp(0)
    val up = SyncAction(SyncAction.Upsert, "k1", Some(ResourceEventRow(
      "ADD", 1, ts, "k1", "ns", "n", "Deployment", "apps/v1", "apps", null, null, ts)))
    val del = SyncAction(SyncAction.Delete, "k2", None)
    val d = delta("graft_upserts_total", "graft_deletes_total") {
      Payloads.fromActions(Seq(up, del, up), maxBatch = 10)
    }
    assert(d("graft_upserts_total") == 2 && d("graft_deletes_total") == 1)
  }

  test("resync runs count; GET /metrics exposes the counters") {
    val sched = new ResyncScheduler(intervalMs = 3600000, doResync = () => 5L)
    val api = new ApiServer(":0", sched).start()
    try {
      val d = delta("graft_resyncs_total", "graft_resync_resources_total") {
        sched.triggerNow()
      }
      assert(d("graft_resyncs_total") == 1)
      assert(d("graft_resync_resources_total") == 5)
      val conn = new URI(s"http://127.0.0.1:${api.port}/metrics").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      conn.disconnect()
      assert(body.contains("# TYPE graft_resyncs_total counter"))
      assert("graft_resyncs_total (\\d+)".r.findFirstMatchIn(body)
        .exists(_.group(1).toLong >= 1))
    } finally { api.close(); sched.close() }
  }
}
