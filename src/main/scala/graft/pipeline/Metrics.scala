package graft.pipeline

/** Operational counters in Prometheus text exposition format — the
  * metrics-server analog of the reference's `metrics-bind-address`
  * (cmd/main.go:59-95, controller-runtime metricsserver). Served by
  * [[ApiServer]] at GET /metrics.
  *
  * Counters are per-JVM (no cross-JVM merge on the hot path), and ONLY the
  * driver serves an endpoint ([[ApiServer]]). With the default driver-side
  * sink every delivery counter increments on the driver and is scrapeable.
  * Caveat — executorSideSink mode: payload counters increment inside
  * foreachPartition on EXECUTOR JVMs, which expose no endpoint here, so
  * they are process-local diagnostics; wiring them into a scraper needs an
  * executor-local agent or Spark's metrics system (out of scope — the
  * reference is single-process and has no equivalent split).
  */
object Metrics {

  final class Registry extends Serializable {
    private val counters = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.LongAdder]()

    def inc(name: String, delta: Long = 1L): Unit =
      counters.computeIfAbsent(name,
        _ => new java.util.concurrent.atomic.LongAdder).add(delta)

    def value(name: String): Long =
      Option(counters.get(name)).map(_.sum()).getOrElse(0L)

    /** Prometheus text exposition (all counters), stable name order. */
    def exposition: String = {
      import scala.jdk.CollectionConverters._
      counters.asScala.toSeq.sortBy(_._1).map { case (k, v) =>
        s"# TYPE $k counter\n$k ${v.sum()}"
      }.mkString("", "\n", "\n")
    }
  }

  /** The process default registry (like Prometheus's default registry). */
  val global = new Registry
}
