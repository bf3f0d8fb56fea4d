package graft.pipeline

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Operational HTTP API (reference: internal/api/server.go): exposes the
  * ad-hoc resync trigger at `POST /api/v1/resync`, bound to the config's
  * API_BIND_ADDRESS (config.go:54) — the last piece of the A20 surface that
  * was config-parsed but unwired. Built on the JDK's HttpServer so the
  * engine stays dependency-free.
  *
  * Contract parity (server.go:79-97):
  *   - success  → 200 {"status":"ok","resources":N,"message":"resynced N resources"}
  *   - failure  → 500 {"status":"error","resources":0,"message":"resync failed: ..."}
  *   - non-POST → 405 (the reference's "POST /api/v1/resync" mux pattern)
  *   - already running → 429 (engine addition: a second concurrent request
  *     is rejected up front instead of parking a handler thread for the
  *     length of a full source scan)
  *
  * The trigger funnels through [[ResyncScheduler.triggerNow]], so API-driven
  * and cadence-driven resyncs serialize on the same runner and can never
  * overlap (the reference serializes identically).
  *
  * Also serves the liveness/readiness pings the reference registers on its
  * controller-runtime manager (cmd/main.go:184-188, healthz.Ping): GET
  * /healthz and GET /readyz → 200 "ok". Probes must never block behind a
  * running resync, so they bypass the scheduler entirely.
  */
final class ApiServer(bindAddress: String, scheduler: ResyncScheduler)
    extends AutoCloseable {

  private val server: HttpServer = {
    val addr = ApiServer.parseBind(bindAddress)
    val s = HttpServer.create(addr, 0)
    s.createContext("/api/v1/resync", (ex: HttpExchange) => handleResync(ex))
    s.createContext("/healthz", (ex: HttpExchange) => handlePing(ex))
    s.createContext("/readyz", (ex: HttpExchange) => handlePing(ex))
    s.createContext("/metrics", (ex: HttpExchange) => handleMetrics(ex))
    // a small BOUNDED pool, NOT the single dispatch thread: a resync can
    // run for the length of a full source scan and liveness/readiness
    // probes must answer while it does — but an unbounded (cached) pool
    // plus a blocking handler is a thread-exhaustion surface on an ops
    // endpoint. Four threads cover probes + metrics + the one admitted
    // resync; extra resync requests are rejected up front (429 below)
    // instead of parking a thread each for the length of a scan.
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-api"); t.setDaemon(true); t
    }))
    s
  }

  // admission gate for the one long-running endpoint: a second concurrent
  // resync request answers 429 immediately rather than queueing behind the
  // running scan (the ResyncScheduler would serialize it anyway)
  private val resyncInFlight = new java.util.concurrent.atomic.AtomicBoolean(false)

  def start(): this.type = { server.start(); this }

  /** The actual bound port (for tests binding port 0). */
  def port: Int = server.getAddress.getPort

  private def handleResync(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") respond(ex, 405,
        """{"status":"error","resources":0,"message":"method not allowed"}""")
      else if (!resyncInFlight.compareAndSet(false, true))
        respond(ex, 429,
          """{"status":"error","resources":0,"message":"resync already in progress"}""")
      else
        try {
          val n = scheduler.triggerNow()
          respond(ex, 200,
            s"""{"status":"ok","resources":$n,"message":"resynced $n resources"}""")
        } catch {
          case e: Exception =>
            // full JSON escaping (Payloads.jstr), not just quote swapping:
            // Spark exception messages are routinely multi-line, and
            // getMessage can be null (NPE) — either would produce an
            // invalid or crashed 500 body
            val msg = Payloads.jstr("resync failed: " +
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
            respond(ex, 500,
              s"""{"status":"error","resources":0,"message":$msg}""")
        } finally resyncInFlight.set(false)
    } finally ex.close()

  /** Prometheus scrape endpoint (metrics-bind-address analog,
    * cmd/main.go:59-95): this JVM's [[Metrics.global]] counters.
    */
  private def handleMetrics(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, "method not allowed", PromText)
      else respond(ex, 200, Metrics.global.exposition, PromText)
    } finally ex.close()

  private def handlePing(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, "method not allowed", "text/plain")
      else respond(ex, 200, "ok", "text/plain")
    } finally ex.close()

  // the exposition format's registered content type
  private val PromText = "text/plain; version=0.0.4; charset=utf-8"

  private def respond(
      ex: HttpExchange, status: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  override def close(): Unit = server.stop(0)
}

object ApiServer {
  /** ":8082" (all interfaces) or "host:port", matching Go's net.Listen. */
  private[pipeline] def parseBind(bind: String): InetSocketAddress = {
    val i = bind.lastIndexOf(':')
    require(i >= 0, s"bind address must contain a port, got '$bind'")
    val port = bind.substring(i + 1).toInt
    val host = bind.substring(0, i)
    if (host.isEmpty) new InetSocketAddress(port)
    else new InetSocketAddress(host, port)
  }

  /** Wire from config: bind API_BIND_ADDRESS, trigger through `scheduler`. */
  def fromConfig(config: SyncPipeline.Config, scheduler: ResyncScheduler): ApiServer =
    new ApiServer(config.apiBindAddress, scheduler)
}
