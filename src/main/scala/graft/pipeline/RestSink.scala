package graft.pipeline

/** Sink-side HTTP retry envelope (reference: internal/client/rest.go:65-158):
  * ≤3 retries, exponential backoff 1 s → 30 s ×2 with 75-100 % jitter, 4xx
  * fails fast (client error — retrying can't help), empty payloads skipped.
  *
  * Plain Scala (no Catalyst involvement): this runs inside
  * `foreachBatch`/`foreachPartition` on executors, one instance per
  * partition, so connection state never crosses task boundaries. `post`,
  * `sleep`, and `jitter` are injectable for deterministic tests (the
  * reference tests the same seams with httptest servers).
  */
final case class RetryConfig(
    maxRetries: Int = 3,
    initialBackoffMs: Long = 1000,
    maxBackoffMs: Long = 30000,
    multiplier: Double = 2.0)

final class RestSink(
    post: String => Int, // payload JSON → HTTP status
    config: RetryConfig = RetryConfig(),
    sleep: Long => Unit = Thread.sleep,
    jitter: () => Double = () => 0.75 + scala.util.Random.nextDouble() * 0.25)
    extends Serializable {

  /** Result of one send: Delivered, or failed terminally. */
  sealed trait Result
  case object Delivered extends Result
  case object SkippedEmpty extends Result
  final case class ClientError(status: Int) extends Result // 4xx: no retry
  final case class Exhausted(lastStatus: Int) extends Result

  /** Backoff before retry n (0-based): min(initial·mult^n, max) · jitter,
    * jitter ∈ [0.75, 1.0] (rest.go:150-158).
    */
  def backoffMs(attempt: Int): Long = {
    val base = config.initialBackoffMs * math.pow(config.multiplier, attempt.toDouble)
    (math.min(base, config.maxBackoffMs.toDouble) * jitter()).toLong
  }

  def send(payloadJson: String): Result = {
    if (payloadJson == null || payloadJson.isEmpty || payloadJson == "{}")
      return SkippedEmpty // rest.go:83-85
    var attempt = 0
    var last = 0
    while (attempt <= config.maxRetries) {
      val status =
        try post(payloadJson)
        catch { case _: java.io.IOException => 599 } // transport error: retryable
      if (status >= 200 && status < 300) return Delivered
      if (status >= 400 && status < 500) return ClientError(status) // rest.go:139-144
      last = status
      if (attempt < config.maxRetries) sleep(backoffMs(attempt))
      attempt += 1
    }
    Exhausted(last)
  }
}

object RestSink {
  /** Production transport (reference: internal/client/rest.go:95-128): JSON
    * POSTed to `endpoint` with the shared per-JVM HttpClient. The returned
    * sink is serializable — the closure captures only the URI string and
    * timeout; the client itself is resolved lazily by classloader on
    * whichever JVM (driver or executor) runs the send.
    *
    * Status mapping feeds the retry envelope unchanged: 2xx delivered, 4xx
    * fail-fast, 5xx retried; connect/timeout IOExceptions surface as the
    * retryable 599 in [[RestSink.send]].
    */
  def http(endpoint: String, config: RetryConfig = RetryConfig(),
      timeoutMs: Long = 10000): RestSink =
    new RestSink(post = HttpTransport.post(endpoint, _, timeoutMs), config)
}

/** Per-JVM lazy HttpClient holder (HttpClient is not serializable). */
private[pipeline] object HttpTransport {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  def post(endpoint: String, body: String, timeoutMs: Long): Int = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      .statusCode()
  }
}

/** Payload assembly matching the reference's wire contract
  * (README.md:135-154, debounce.go:16-19, 115-118, 200-203): a payload
  * carries upserts *or* deletes, never both; upserts chunk at the max batch
  * size; timestamps serialize as UTC `yyyy-MM-dd'T'HH:mm:ss'Z'`.
  */
object Payloads {
  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  private[pipeline] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  private def jmap(m: Map[String, String]): String =
    if (m == null) "null"
    else m.toSeq.sortBy(_._1).map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")

  def instanceJson(r: ResourceEventRow): String = {
    val created =
      if (r.createdAt == null) "null" else jstr(tsFmt.format(r.createdAt.toInstant))
    s"""{"id":${jstr(r.id)},"namespace":${jstr(r.namespace)},"name":${jstr(r.name)},""" +
      s""""kind":${jstr(r.kind)},"apiVersion":${jstr(r.apiVersion)},""" +
      s""""apiGroup":${jstr(r.apiGroup)},"labels":${jmap(r.labels)},""" +
      s""""annotations":${jmap(r.annotations)},"createdAt":$created}"""
  }

  /** Assemble wire payloads from pre-serialized JSON values: every delete
    * batch first (the fast path), then upserts chunked at `maxBatch`
    * (BATCH_MAX_SIZE=50, config.go:50). Shared by the instance and CRD
    * pipelines so the split/chunk/escape contract lives in one place.
    */
  def build(deleteJsons: Seq[String], upsertJsons: Seq[String], maxBatch: Int): Seq[String] = {
    val delPayloads =
      if (deleteJsons.isEmpty) Nil
      else Seq(deleteJsons.mkString("""{"deletes":[""", ",", "]}"))
    val upPayloads = upsertJsons.grouped(math.max(1, maxBatch)).map {
      _.mkString("""{"upserts":[""", ",", "]}")
    }.toSeq
    delPayloads ++ upPayloads
  }

  /** Instance-pipeline payloads from a micro-batch of actions. Counting
    * happens at delivery success (SyncPipeline), NOT here: build-time
    * counters would double on every failed-epoch replay and task retry,
    * and would count actions that were never delivered at all.
    */
  def fromActions(actions: Seq[SyncAction], maxBatch: Int = 50): Seq[String] = {
    val (dels, ups) = actions.partition(_.action == SyncAction.Delete)
    build(dels.map(d => jstr(d.id)), ups.flatMap(_.instance).map(instanceJson), maxBatch)
  }

  /** Deliver payloads, honoring the delivery contract: a transient failure
    * (retries exhausted on 5xx/transport) throws so the streaming epoch
    * fails and replays — exactly-once is preserved by the idempotent
    * downstream keyed on id. A 4xx is permanent (replay cannot heal it —
    * same payload, same answer): logged and dropped, matching the
    * reference's fail-fast classification (rest.go:139-144).
    */
  def deliver(sink: RestSink, payloads: Seq[String]): Unit = {
    // delivered is counted AFTER the whole batch succeeds, matching the
    // deferred upsert/delete counters in SyncPipeline.start — counting
    // per-payload as delivery proceeds would double-count the pre-failure
    // payloads of every failed-and-replayed epoch. failures/drops stay
    // immediate: a failure aborts this method (nothing else will record
    // it) and a 4xx drop is final on first sight.
    var delivered = 0L
    payloads.foreach { p =>
      sink.send(p) match {
        case sink.Exhausted(status) =>
          Metrics.global.inc("graft_payload_failures_total")
          throw new java.io.IOException(
            s"payload delivery failed after retries (last status $status)")
        case sink.ClientError(status) =>
          Metrics.global.inc("graft_payloads_dropped_total")
          System.err.println(s"[sink] dropping payload rejected with $status")
        case sink.Delivered =>
          delivered += 1
        case _ => ()
      }
    }
    if (delivered > 0)
      Metrics.global.inc("graft_payloads_delivered_total", delivered)
  }
}
