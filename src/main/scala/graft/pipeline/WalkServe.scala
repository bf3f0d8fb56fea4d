package graft.pipeline

import graft.queries.{EpochStore, GraphServing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** STREAMING query serving over the graph-walk pack — the QUERY side of
  * the serving story. [[graft.queries.GraphServing]] gives a warm
  * [[graft.queries.GraphServing.Handle]] that answers repeated BATCH
  * calls; a retrieval deployment receives queries as a STREAM while the
  * maintainer loop ([[IndexSync]], `servingPackDir`) refreshes the pack
  * underneath it. This loop closes that gap:
  *
  *   - every micro-batch of (q_id, q_emb) rows answers through ONE warm
  *     handle, opened once and reused across batches — no per-batch
  *     meta/seed/adjacency re-resolution (each batch stays
  *     broadcast-small by the Handle contract; the pack reads stay
  *     frontier-bucket-pruned);
  *   - results land as epoch-tagged parquet (`outDir/b<epochId>`,
  *     overwrite, visible only once its commit marker lands) — a
  *     REPLAYED batch after a crash rewrites the same dir, so output is
  *     exactly-once per stream epoch with no marker state beyond the
  *     engine's standard dir-commit discipline;
  *   - the per-epoch dirs have a LIFECYCLE: [[fold]] consolidates
  *     committed batch dirs into one committed results store on a
  *     cadence (`foldEvery` folds in-loop, or call the verb from a
  *     maintainer) and [[vacuum]] drops what the fold superseded, so a
  *     long-running server holds O(foldEvery) live dirs instead of one
  *     per trigger forever — the shard→fold→vacuum shape every other
  *     store in the engine uses, applied to the serving results;
  *   - STALENESS-AWARE: before answering, the loop compares the pack's
  *     committed epoch to the handle's and reopens on advance (one meta
  *     listing per batch — never a data read). Queries pick up refreshed
  *     state at the next batch boundary and serving NEVER blocks on
  *     maintenance: readers and the refresh interleave through the
  *     EpochStore commit protocol, exactly as the spec's
  *     serve-while-refreshing case drives it;
  *   - FILTERED serving: a non-null `allowedIds` routes every batch
  *     through [[graft.queries.GraphServing.Handle.topK]]'s
  *     metadata-filtered overload — tenant-scoped retrieval through the
  *     stream — and [[startTenants]] serves a MULTI-TENANT stream (a
  *     tenant column routes each query to its own allowlist,
  *     fail-closed for unknown tenants). The handle's auto-widen
  *     selectivity measurement is memoized per allowlist frame, so the
  *     stream pays it once per handle per tenant, not once per trigger.
  *
  * At 100 TB this is the deployment shape: a query stream (partitioned by
  * tenant/shard) hits a fleet of warm handles; maintenance cost lives
  * entirely in the maintainer's loop, and the serving plan is the same
  * pruned walk [[graft.queries.GraphServing.Handle.topK]] prices in BENCH
  * (`graphsearch_queries_per_s`). The folded results store bounds the
  * output's filesystem metadata at any uptime.
  */
object WalkServe {

  import EpochStore.{CommitMarker, clearDirsAbove, dirEpoch, fsOf}

  private def batchDir(outDir: String, epoch: Long) = s"$outDir/b$epoch"
  private def foldedDir(outDir: String, e: Int) = s"$outDir/folded/e$e"
  private def foldMetaDir(outDir: String) = s"$outDir/foldmeta"

  /** A running serving loop. [[stop]] is the clean shutdown: it stops
    * the streaming query AND closes the current handle (releasing its
    * pinned seed-vector checkpoint eagerly); an abnormal termination is
    * caught by a [[StreamingQueryListener]] hook that does the same.
    */
  final class Serving private[pipeline] (val query: StreamingQuery,
      closer: () => Unit, spark: SparkSession, outDir: String) {
    def stop(): Unit = { query.stop(); closer() }
    def describe(): ServeLoopStats = WalkServe.describe(spark, outDir)
  }

  /** Start the serving loop: `queries` is a STREAMING frame with
    * (q_id LONG, q_emb ARRAY<FLOAT>) columns. Each micro-batch's top-`k`
    * lands at `outDir/b<epochId>` with a `batch` column, committed by
    * marker. `allowedIds` (optional) scopes every answer to an allowlist
    * of vec_ids through the filtered walk. `foldEvery` > 0 folds + vacuums
    * in-loop once that many committed batch dirs sit above the fold
    * watermark. Returns the [[Serving]] handle.
    */
  def start(queries: DataFrame, packDir: String, outDir: String,
      checkpointDir: String, k: Int = 5, triggerMs: Long = 100,
      allowedIds: DataFrame = null, foldEvery: Int = 0)(
      implicit spark: SparkSession): Serving =
    serveLoop(queries, packDir, outDir, checkpointDir, triggerMs, foldEvery,
      collectBatch = b => b
        .select(org.apache.spark.sql.functions.col("q_id").cast("long"),
          org.apache.spark.sql.functions.col("q_emb").cast("array<float>"))
        .collect(),
      answer = (handle, rows) => {
        import spark.implicits._
        val local = rows.toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
          .toDF("q_id", "q_emb")
        Some((
          if (allowedIds != null) handle.topK(local, k, allowedIds)
          else handle.topK(local, k),
          rows.map(_.getLong(0)).distinct.length.toLong))
      })

  /** MULTI-TENANT filtered serving: `queries` carries (q_id LONG,
    * q_emb ARRAY<FLOAT>, tenant STRING) and every tenant's queries
    * answer through [[graft.queries.GraphServing.Handle.topK]]'s
    * allowlist overload under THAT tenant's allowlist — the
    * tenant-scoped retrieval deployment, one warm handle and one output
    * store for the whole fleet of tenants. Results carry the `tenant`
    * column beside (q_id, rnk, vec_id, cos, batch). Tenant isolation
    * fails CLOSED: rows whose tenant has no allowlist are DROPPED (and
    * counted on `graft_walkserve_unknown_tenant_total`), never answered
    * unfiltered. The handle memoizes each allowlist's widen factor by
    * frame identity, so reuse the SAME map values across the stream's
    * lifetime (a per-call measurement is exactly what the memo
    * retires). One serving MODE per outDir — the tenant column must be
    * present in every dir [[fold]] unions.
    */
  def startTenants(queries: DataFrame, packDir: String, outDir: String,
      checkpointDir: String, allowlists: Map[String, DataFrame],
      k: Int = 5, triggerMs: Long = 100, foldEvery: Int = 0)(
      implicit spark: SparkSession): Serving =
    serveLoop(queries, packDir, outDir, checkpointDir, triggerMs, foldEvery,
      collectBatch = b => b
        .select(org.apache.spark.sql.functions.col("q_id").cast("long"),
          org.apache.spark.sql.functions.col("q_emb").cast("array<float>"),
          org.apache.spark.sql.functions.col("tenant").cast("string"))
        .collect(),
      answer = (handle, rows) => {
        import spark.implicits._
        val (known, unknown) =
          rows.partition(r => allowlists.contains(r.getString(2)))
        if (unknown.nonEmpty)
          Metrics.global.inc("graft_walkserve_unknown_tenant_total",
            unknown.length.toLong)
        val perTenant = known.groupBy(_.getString(2)).toSeq.sortBy(_._1)
          .map { case (tenant, trs) =>
            val local = trs.toSeq
              .map(r => (r.getLong(0), r.getSeq[Float](1)))
              .toDF("q_id", "q_emb")
            handle.topK(local, k, allowlists(tenant))
              .withColumn("tenant",
                org.apache.spark.sql.functions.lit(tenant))
          }
        perTenant.reduceOption(_ unionByName _).map(df =>
          // served-query count excludes the dropped unknown tenants
          (df, known.map(r => (r.getString(2), r.getLong(0)))
            .distinct.length.toLong))
      })

  /** The shared micro-batch serving loop behind [[start]] and
    * [[startTenants]]: per batch — collect (broadcast-small by the
    * Handle contract), staleness-aware reopen, answer, marker-committed
    * epoch dir, counters, and the loop-local fold cadence.
    */
  private def serveLoop(queries: DataFrame, packDir: String, outDir: String,
      checkpointDir: String, triggerMs: Long, foldEvery: Int,
      collectBatch: DataFrame => Array[org.apache.spark.sql.Row],
      answer: (GraphServing.Handle, Array[org.apache.spark.sql.Row])
        => Option[(DataFrame, Long)])(
      implicit spark: SparkSession): Serving = {
    val handleRef = new java.util.concurrent.atomic.AtomicReference(
      GraphServing.open(spark, packDir))
    val closer = () => {
      val h = handleRef.getAndSet(null)
      if (h != null) h.close()
    }
    // the loop is the FOLD WRITER when foldEvery > 0 (the store's
    // single-writer contract — see fold()), so the fold watermark and
    // the committed-batch count live in LOOP-LOCAL state, initialized
    // once from disk: the cadence check costs no per-trigger meta-read
    // job and no per-trigger listing (the r17 review's hot-path finding
    // — at a 100 ms trigger those were ~10 driver jobs + O(dirs)
    // exists() probes per second)
    var loopThrough = -1L
    var loopLive = -1 // lazy init below — avoids the I/O when foldEvery=0
    val query = try { queries.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // ONE evaluation of the micro-batch: the query batch is
        // broadcast-small by the Handle contract, so collect it here and
        // feed the walk a local relation — emptiness, the served-queries
        // counter, and the walk's own internal collect all come from
        // these rows instead of three separate source re-reads per
        // trigger (a file/Kafka source re-reads its data per evaluation)
        val rows = collectBatch(batch)
        if (rows.nonEmpty) {
          val committed = GraphServing.readMeta(spark, packDir).epoch
          if (committed != handleRef.get().meta.epoch) {
            // the maintainer advanced the pack — pick it up at this batch
            // boundary; close() releases the superseded handle's pinned
            // seed blocks eagerly instead of waiting out the driver's
            // periodic cleaner GC
            val old = handleRef.getAndSet(GraphServing.open(spark, packDir))
            old.close()
            Metrics.global.inc("graft_walkserve_reopens_total")
          }
          answer(handleRef.get(), rows).foreach { case (answered, served) =>
            val dir = batchDir(outDir, epochId)
            answered
              .withColumn("batch",
                org.apache.spark.sql.functions.lit(epochId))
              .write.mode("overwrite").parquet(dir)
            // marker AFTER the data: a concurrent results()/fold() listing
            // mid-write (or mid-replay-overwrite) skips the uncommitted
            // dir instead of reading partial rows
            fsOf(spark, dir).create(
              new org.apache.hadoop.fs.Path(dir, CommitMarker), true).close()
            Metrics.global.inc("graft_walkserve_batches_total")
            Metrics.global.inc("graft_walkserve_queries_total", served)
            if (foldEvery > 0) {
              if (loopLive < 0) { // once per (re)start: recover from disk
                val (_, through) = foldState(spark, outDir)
                loopThrough = through
                loopLive = committedBatchEpochs(spark, outDir)
                  .count(_ > through)
              } else if (epochId > loopThrough) loopLive += 1
              // a REPLAYED epoch at or below the watermark rewrote its
              // dir but its rows already live in the fold — must not count
              if (loopLive >= foldEvery) {
                fold(spark, outDir)
                vacuum(spark, outDir)
                loopThrough = epochId
                loopLive = 0
              }
            }
          }
        }
        ()
      }
      .start()
    } catch {
      case t: Throwable =>
        // a start-time failure (unwritable checkpoint, rejected plan)
        // must not leak the pre-opened handle's pinned blocks — the
        // exact leak class close()/Release exist to prevent
        closer(); throw t
    }
    // abnormal-termination hook: a query that dies on an exception (or is
    // stopped via spark.streams) must not leave the handle's checkpoint
    // blocks pinned until JVM exit. unpersist is idempotent, so the
    // double-close via Serving.stop() is harmless.
    val listener: StreamingQueryListener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          closer()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    // the listener registers after start() by necessity (it filters on
    // the query id) — close the miss window where a query self-terminated
    // in between (closer is idempotent)
    if (!query.isActive) closer()
    new Serving(query, closer, spark, outDir)
  }

  /** Committed (marker-bearing) batch epochs under `outDir`. */
  private def committedBatchEpochs(spark: SparkSession,
      outDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = fsOf(spark, outDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath).toSeq
      .filter { p =>
        val n = p.getName
        n.length > 1 && n.startsWith("b") && n.drop(1).forall(_.isDigit) &&
          fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker))
      }
      .map(_.getName.drop(1).toLong)
  }

  /** (committed fold epoch, highest batch epoch it folded) — (−1, −1)
    * before the first fold.
    */
  private def foldState(spark: SparkSession, outDir: String): (Int, Long) = {
    val md = new org.apache.hadoop.fs.Path(foldMetaDir(outDir))
    val fs = fsOf(spark, outDir)
    if (!fs.exists(md)) (-1, -1L)
    else {
      val es = fs.listStatus(md).map(_.getPath)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker)))
        .flatMap(p => dirEpoch(p.getName))
      if (es.isEmpty) (-1, -1L)
      else {
        val e = es.max
        val r = spark.read.parquet(s"${foldMetaDir(outDir)}/e$e").head
        (e, r.getAs[Long]("folded_through"))
      }
    }
  }

  /** FOLD: consolidate every committed batch dir above the fold
    * watermark (plus the previous folded store) into one fresh committed
    * results store — the bounded-metadata answer to one-dir-per-trigger.
    * Rows are preserved exactly ([[results]] is row-identical across a
    * fold); a crashed fold's orphan dirs roll back on the next verb (the
    * shared [[EpochStore]] discipline), and a batch epoch REPLAYED after
    * it was folded rewrites its own dir below the watermark, where
    * [[results]] ignores it — its rows already live in the fold, so a
    * replay can never duplicate. Returns the committed fold epoch (the
    * previous one when there was nothing new to fold).
    *
    * SINGLE FOLD WRITER per outDir — the same single-writer contract
    * every store in the engine carries: with `foldEvery > 0` the serving
    * loop IS that writer (it tracks the watermark loop-locally), so an
    * external maintainer must not fold the same outDir concurrently; two
    * concurrent folds would race the same next epoch dir.
    */
  def fold(spark: SparkSession, outDir: String): Int = {
    val (fEpoch, through) = foldState(spark, outDir)
    val fresh = committedBatchEpochs(spark, outDir).filter(_ > through).sorted
    if (fresh.isEmpty) return fEpoch
    clearDirsAbove(spark, s"$outDir/folded", fEpoch)
    clearDirsAbove(spark, foldMetaDir(outDir), fEpoch)
    val next = fEpoch + 1
    val parts = fresh.map(e => spark.read.parquet(batchDir(outDir, e))) ++
      (if (fEpoch >= 0) Seq(spark.read.parquet(foldedDir(outDir, fEpoch)))
       else Nil)
    parts.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(foldedDir(outDir, next))
    import spark.implicits._
    val mp = s"${foldMetaDir(outDir)}/e$next"
    Seq((next, fresh.max)).toDF("epoch", "folded_through")
      .coalesce(1).write.mode("overwrite").parquet(mp)
    fsOf(spark, mp).create(
      new org.apache.hadoop.fs.Path(mp, CommitMarker), true).close()
    Metrics.global.inc("graft_walkserve_folds_total")
    next
  }

  /** Drop what the committed fold superseded: COMMITTED batch dirs at or
    * below the fold watermark (their rows live in the folded store —
    * including any a replay re-minted) and folded/foldmeta epochs below
    * the committed one. Marker-less dirs are never touched: one is
    * either a crashed write whose stream epoch will replay (the replay
    * overwrites it) or a dir from a pre-marker layout, and deleting the
    * latter would drop rows no fold ever consolidated. Same single-writer
    * contract as [[fold]]. Returns dirs removed.
    */
  def vacuum(spark: SparkSession, outDir: String): Int = {
    val (fEpoch, through) = foldState(spark, outDir)
    if (fEpoch < 0) return 0
    val fs = fsOf(spark, outDir)
    val batches = {
      val root = new org.apache.hadoop.fs.Path(outDir)
      if (!fs.exists(root)) Seq.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).map(_.getPath).toSeq.filter { p =>
        val n = p.getName
        n.length > 1 && n.startsWith("b") && n.drop(1).forall(_.isDigit) &&
          n.drop(1).toLong <= through &&
          fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker))
      }
    }
    batches.foreach(p =>
      require(fs.delete(p, true), s"could not vacuum $p"))
    val olds = (0 until fEpoch).flatMap(e =>
      Seq(new org.apache.hadoop.fs.Path(foldedDir(outDir, e)),
        new org.apache.hadoop.fs.Path(s"${foldMetaDir(outDir)}/e$e")))
      .filter(fs.exists)
    olds.foreach(p => require(fs.delete(p, true), s"could not vacuum $p"))
    batches.length + olds.length
  }

  /** Everything served so far (q_id, rnk, vec_id, cos, batch) — the
    * committed folded store plus every committed batch dir above the
    * fold watermark. Uncommitted dirs (mid-write, mid-replay) and
    * below-watermark replays are invisible. Empty (schema-bearing)
    * before the first commit, rather than a path error.
    *
    * The frame is a LISTING-TIME SNAPSHOT over concrete paths — the
    * contract every vacuuming store's direct read has: under an active
    * fold cadence, evaluate it promptly (or re-call on a
    * FileNotFoundException) rather than holding it across a later
    * fold + vacuum, which may delete the listed batch dirs after their
    * rows moved into the folded store.
    */
  def results(spark: SparkSession, outDir: String): DataFrame = {
    val (fEpoch, through) = foldState(spark, outDir)
    val dirs = committedBatchEpochs(spark, outDir).filter(_ > through)
      .sorted.map(batchDir(outDir, _)) ++
      (if (fEpoch >= 0) Seq(foldedDir(outDir, fEpoch)) else Nil)
    if (dirs.isEmpty)
      spark.range(0).select(
        org.apache.spark.sql.functions.col("id").as("q_id"),
        org.apache.spark.sql.functions.lit(0).as("rnk"),
        org.apache.spark.sql.functions.col("id").as("vec_id"),
        org.apache.spark.sql.functions.lit(0.0).as("cos"),
        org.apache.spark.sql.functions.col("id").as("batch"))
    else spark.read.parquet(dirs: _*)
  }

  /** One listing + the loop's per-JVM counters — no data read. `liveBatchDirs`
    * counts committed dirs above the fold watermark (what [[results]]
    * unions beside the folded store); the counters are process-global
    * across every loop in this JVM (the [[Metrics]] registry contract).
    */
  final case class ServeLoopStats(foldEpoch: Int, foldedThrough: Long,
      liveBatchDirs: Int, batches: Long, queries: Long, reopens: Long,
      folds: Long)

  def describe(spark: SparkSession, outDir: String): ServeLoopStats = {
    val (fEpoch, through) = foldState(spark, outDir)
    ServeLoopStats(fEpoch, through,
      committedBatchEpochs(spark, outDir).count(_ > through),
      Metrics.global.value("graft_walkserve_batches_total"),
      Metrics.global.value("graft_walkserve_queries_total"),
      Metrics.global.value("graft_walkserve_reopens_total"),
      Metrics.global.value("graft_walkserve_folds_total"))
  }
}
