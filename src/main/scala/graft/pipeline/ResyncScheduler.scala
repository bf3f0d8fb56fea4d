package graft.pipeline

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Scheduled + ad-hoc resync driver (reference: the RESYNC_INTERVAL_MIN
  * ticker in watcher.go:349-383 plus the POST /resync handler,
  * api/server.go:79-97). The actual snapshot replay is
  * [[SyncPipeline.resync]]; this class owns only WHEN it runs: a fixed
  * cadence from config, and an on-demand trigger for operators — both
  * funnel through one synchronized runner so a slow resync can't overlap
  * itself (the reference serializes through a single goroutine the same
  * way).
  *
  * Driver-side by design: resync enumeration must be a single consistent
  * snapshot pass; the heavy lifting (the snapshot scan) is still a
  * distributed Dataset, streamed through `toLocalIterator` in maxBatch
  * chunks.
  */
final class ResyncScheduler(
    intervalMs: Long,
    doResync: () => Long,
    scheduler: ScheduledExecutorService =
      Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-resync")
        t.setDaemon(true)
        t
      })) extends AutoCloseable {

  require(intervalMs > 0, s"resync interval must be positive, got $intervalMs")

  private val completed = new AtomicLong(0)
  private val synced = new AtomicLong(0)

  /** Serialized runner: cadence ticks and ad-hoc triggers never overlap. */
  private def runOnce(): Long = synchronized {
    val n = doResync()
    synced.addAndGet(n)
    completed.incrementAndGet()
    Metrics.global.inc("graft_resyncs_total")
    Metrics.global.inc("graft_resync_resources_total", n)
    n
  }

  /** Arm the cadence (first run after one full interval, like the
    * reference's ticker — startup correctness comes from the initial
    * informer List, not a resync).
    */
  def start(): this.type = {
    // a task that THROWS silently cancels scheduleAtFixedRate's future
    // runs — one transient sink outage during a tick must not kill the
    // cadence for the rest of the process lifetime (the reference's ticker
    // keeps ticking through failed resyncs). Ad-hoc triggerNow still
    // propagates, so the API's 500 contract is untouched.
    scheduler.scheduleAtFixedRate(() =>
      try runOnce()
      catch {
        case scala.util.control.NonFatal(e) =>
          Metrics.global.inc("graft_resync_failures_total")
          System.err.println(s"[resync] scheduled resync failed: ${e.getMessage}")
      }, intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    this
  }

  /** Ad-hoc resync (the POST /resync analog); returns rows synced. */
  def triggerNow(): Long = runOnce()

  /** (completed resync runs, total rows synced) — the API's status surface. */
  def stats: (Long, Long) = (completed.get(), synced.get())

  override def close(): Unit = scheduler.shutdownNow()
}

object ResyncScheduler {
  /** Wire from config: RESYNC_INTERVAL_MIN minutes → ms (config.go:51). */
  def fromConfig(config: SyncPipeline.Config, doResync: () => Long): ResyncScheduler =
    new ResyncScheduler(config.resyncIntervalMin * 60L * 1000L, doResync)
}
