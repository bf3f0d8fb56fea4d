package graft.pipeline

/** Operational counters in Prometheus text exposition format — the
  * metrics-server analog of the reference's `metrics-bind-address`
  * (cmd/main.go:59-95, controller-runtime metricsserver). Served by
  * [[ApiServer]] at GET /metrics.
  *
  * Counters are per-JVM by design, the standard Prometheus pattern: in a
  * cluster every driver/executor process exposes its own endpoint and the
  * scraper sums across instances — so executor-side sink deliveries count
  * where they happen, and nothing needs a cross-JVM merge on the hot path.
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
