package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.net.{HttpURLConnection, URI}
import scala.io.Source

/** The POST /api/v1/resync contract (reference api/server.go:79-97): ok and
  * error JSON shapes, method gating, and that API triggers funnel through
  * the same serialized ResyncScheduler runner as the cadence.
  */
class ApiServerSpec extends AnyFunSuite {

  private def call(port: Int, method: String,
      path: String = "/api/v1/resync"): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (method == "POST") { conn.setDoOutput(true); conn.getOutputStream.close() }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("POST /api/v1/resync runs the resync and reports the count") {
    val runs = new java.util.concurrent.atomic.AtomicLong(0)
    val sched = new ResyncScheduler(intervalMs = 3600000,
      doResync = () => { runs.incrementAndGet(); 7L })
    val api = new ApiServer(":0", sched).start()
    try {
      val (code, body) = call(api.port, "POST")
      assert(code == 200)
      assert(body == """{"status":"ok","resources":7,"message":"resynced 7 resources"}""")
      assert(runs.get() == 1)
      // stats surface accumulates API-driven runs like cadence runs
      assert(sched.stats == ((1L, 7L)))
    } finally { api.close(); sched.close() }
  }

  test("non-POST is rejected with 405, resync not run") {
    val runs = new java.util.concurrent.atomic.AtomicLong(0)
    val sched = new ResyncScheduler(intervalMs = 3600000,
      doResync = () => { runs.incrementAndGet(); 1L })
    val api = new ApiServer(":0", sched).start()
    try {
      val (code, _) = call(api.port, "GET")
      assert(code == 405)
      assert(runs.get() == 0)
    } finally { api.close(); sched.close() }
  }

  test("a throwing resync maps to 500 with the error envelope") {
    val sched = new ResyncScheduler(intervalMs = 3600000,
      doResync = () => throw new RuntimeException("store \"down\""))
    val api = new ApiServer(":0", sched).start()
    try {
      val (code, body) = call(api.port, "POST")
      assert(code == 500)
      assert(body.startsWith("""{"status":"error","resources":0,"message":"resync failed:"""))
      assert(!body.contains("\"down\"")) // quotes sanitized, JSON stays valid
    } finally { api.close(); sched.close() }
  }

  test("GET /healthz and /readyz ping 200 without touching the scheduler") {
    val runs = new java.util.concurrent.atomic.AtomicLong(0)
    val sched = new ResyncScheduler(intervalMs = 3600000,
      doResync = () => { runs.incrementAndGet(); 1L })
    val api = new ApiServer(":0", sched).start()
    try {
      for (p <- Seq("/healthz", "/readyz")) {
        val (code, body) = call(api.port, "GET", p)
        assert(code == 200 && body == "ok", p)
        assert(call(api.port, "POST", p)._1 == 405, p)
      }
      assert(runs.get() == 0)
    } finally { api.close(); sched.close() }
  }

  test("a second resync while one runs is rejected 429, probes still answer") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val sched = new ResyncScheduler(intervalMs = 3600000,
      doResync = () => { entered.countDown(); gate.await(); 1L })
    val api = new ApiServer(":0", sched).start()
    try {
      val first = new java.util.concurrent.FutureTask(() => call(api.port, "POST"))
      new Thread(first, "first-resync").start()
      assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS))
      // the long scan is in flight: a second request must NOT park a
      // handler thread behind it
      val (code, body) = call(api.port, "POST")
      assert(code == 429, body)
      assert(body.contains("already in progress"))
      // and liveness keeps answering on the bounded pool
      assert(call(api.port, "GET", "/healthz")._1 == 200)
      gate.countDown()
      assert(first.get(5, java.util.concurrent.TimeUnit.SECONDS)._1 == 200)
    } finally { api.close(); sched.close() }
  }

  test("bind parse: ':port' binds all interfaces, 'host:port' binds host") {
    assert(ApiServer.parseBind(":8082").getPort == 8082)
    val h = ApiServer.parseBind("127.0.0.1:9000")
    assert(h.getHostString == "127.0.0.1" && h.getPort == 9000)
    intercept[IllegalArgumentException](ApiServer.parseBind("8082"))
  }
}
