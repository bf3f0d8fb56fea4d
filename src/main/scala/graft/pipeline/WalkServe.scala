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
  *     [[retain]] completes it by bounding the ROWS (drop folded answers
  *     below a batch watermark) so the output store is bounded at any
  *     uptime, not just its dir count; a stream-identity stamp
  *     ([[checkStreamIdentity]]) makes a reused outDir under a reset
  *     checkpoint fail fast instead of silently losing below-watermark
  *     batches to the fold/vacuum cycle;
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

  /** Presence = the outDir serves TENANT mode (results carry `tenant`). */
  private val TenantModeMarker = "_graft_tenant_mode"

  /** Holds the streaming query id that owns this outDir's epochs. */
  private val StreamIdFile = "_graft_stream_id"

  /** Fail fast when `outDir` holds committed results minted by a
    * DIFFERENT streaming query (see the guard's comment in serveLoop).
    * A stale id file over an otherwise-empty outDir is adopted — there
    * is nothing a colliding epoch could lose.
    */
  private def checkStreamIdentity(spark: SparkSession, outDir: String,
      qid: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(outDir, StreamIdFile)
    val fs = fsOf(spark, outDir)
    val stored =
      if (!fs.exists(p)) null
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      }
    if (stored == qid) return
    if (stored != null) {
      val (_, through) = foldState(spark, outDir)
      if (through >= 0 || committedBatchEpochs(spark, outDir).nonEmpty)
        throw new IllegalStateException(
          s"$outDir holds results committed by stream $stored " +
            s"(fold watermark $through); serving it from a different " +
            s"stream ($qid — a reset/fresh checkpoint) would restart " +
            "epochs at 0 below the watermark, making new batches " +
            "invisible to results() and then vacuumable (silent data " +
            "loss). Use a fresh outDir, or restart from the original " +
            "checkpoint.")
    }
    val out = fs.create(p, true)
    try out.write(qid.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

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
    * q_emb ARRAY<FLOAT>, tenant STRING) and a mixed-tenant micro-batch
    * answers in ONE walk invocation
    * ([[graft.queries.GraphServing.Handle.topKTenants]]: tenant-tagged
    * query rows, the batch's allowlists unioned into a (tenant, vec_id)
    * frame, result selection semi-joined per query — so per-batch
    * latency does NOT scale with the tenant count; the r17 form walked
    * once PER TENANT, serially). Results carry the `tenant` column
    * beside (q_id, rnk, vec_id, cos, batch). Tenant isolation fails
    * CLOSED: rows whose tenant has no allowlist are DROPPED (and counted
    * on `graft_walkserve_unknown_tenant_total`), never answered
    * unfiltered. The handle memoizes each allowlist's widen factor by
    * frame identity, so reuse the SAME map values across the stream's
    * lifetime (a per-call measurement is exactly what the memo retires).
    * The walk requires q_id unique across a batch; a batch where two
    * TENANTS collide on one q_id falls back to the serial per-tenant
    * loop for correctness (counted on
    * `graft_walkserve_qid_collision_batches_total` — a transport
    * assigning globally-unique q_ids never pays it). One serving MODE
    * per outDir — the tenant column must be present in every dir
    * [[fold]] unions. For tenants that come and go while the loop runs,
    * use [[startTenantsDynamic]].
    */
  def startTenants(queries: DataFrame, packDir: String, outDir: String,
      checkpointDir: String, allowlists: Map[String, DataFrame],
      k: Int = 5, triggerMs: Long = 100, foldEvery: Int = 0)(
      implicit spark: SparkSession): Serving =
    serveLoop(queries, packDir, outDir, checkpointDir, triggerMs, foldEvery,
      collectBatch = tenantCollect,
      answer = (handle, rows) => tenantAnswer(spark, handle, rows, k,
        allowlists),
      tenanted = true)

  /** [[startTenants]] with DYNAMIC provisioning: the allowlist registry
    * lives in an epoch-committed [[TenantRegistry]] store at `tenantsDir`
    * and the loop reloads it at batch boundaries on epoch advance —
    * exactly the pack staleness idiom: one FS listing per batch, a data
    * read only when a provision/revoke actually committed. Adding,
    * rotating, or revoking a tenant needs no stream restart:
    *   - a tenant provisioned mid-stream answers from the first batch
    *     that observes the committed epoch (the reload runs before the
    *     batch is answered);
    *   - between provision and pickup — and immediately after a revoke —
    *     the tenant's rows fail CLOSED (dropped + counted), never
    *     answered unfiltered or under a revoked allowlist past the next
    *     batch boundary.
    * Each reload localCheckpoints the registry frame once and derives
    * per-tenant allowlist frames from it, so the handle's widen memo
    * stays once-per-(tenant, registry-epoch), not once per trigger; the
    * superseded checkpoint is released eagerly (the Handle.close
    * discipline applied to registry state).
    */
  def startTenantsDynamic(queries: DataFrame, packDir: String,
      outDir: String, checkpointDir: String, tenantsDir: String,
      k: Int = 5, triggerMs: Long = 100, foldEvery: Int = 0)(
      implicit spark: SparkSession): Serving = {
    import org.apache.spark.sql.functions.col
    // loop-local registry state: (observed epoch, pinned frame, derived
    // per-tenant views). Mutated only on the stream thread; released on
    // close through the loop's extraClose hook.
    var regEpoch = Int.MinValue
    var regFrame: DataFrame = null
    var allowlists: Map[String, DataFrame] = Map.empty
    val releaseReg = () => {
      if (regFrame != null) {
        graft.Release.checkpoint(regFrame); regFrame = null
      }
    }
    serveLoop(queries, packDir, outDir, checkpointDir, triggerMs, foldEvery,
      collectBatch = tenantCollect,
      answer = (handle, rows) => {
        val e = TenantRegistry.epochOf(spark, tenantsDir)
        if (e != regEpoch) {
          releaseReg()
          allowlists =
            if (e < 0) Map.empty
            else {
              regFrame = TenantRegistry.read(spark, tenantsDir)
                .localCheckpoint()
              regFrame.select("tenant").distinct().collect()
                .map(_.getString(0)).sorted
                .map(t => t ->
                  regFrame.filter(col("tenant") === t).select("vec_id"))
                .toMap
            }
          regEpoch = e
          Metrics.global.inc("graft_walkserve_tenant_reloads_total")
        }
        tenantAnswer(spark, handle, rows, k, allowlists)
      },
      tenanted = true, extraClose = releaseReg)
  }

  /** The tenant modes' collectBatch: (q_id, q_emb, tenant), cast-tolerant
    * like the plain mode's.
    */
  private def tenantCollect(b: DataFrame): Array[org.apache.spark.sql.Row] =
    b.select(org.apache.spark.sql.functions.col("q_id").cast("long"),
        org.apache.spark.sql.functions.col("q_emb").cast("array<float>"),
        org.apache.spark.sql.functions.col("tenant").cast("string"))
      .collect()

  /** Answer one tenant-mode batch: fail-closed routing, transport-dup
    * dedup, then ONE [[graft.queries.GraphServing.Handle.topKTenants]]
    * walk — per-batch cost independent of how many tenants the batch
    * mixes. The serial per-tenant loop survives only as the correctness
    * fallback for a cross-tenant q_id collision, which the batched walk
    * cannot carry (q_id keys it).
    */
  private def tenantAnswer(spark: SparkSession,
      handle: GraphServing.Handle, rows: Array[org.apache.spark.sql.Row],
      k: Int, allowlists: Map[String, DataFrame])
      : Option[(DataFrame, Long)] = {
    import spark.implicits._
    val (known, unknown) =
      rows.partition(r => allowlists.contains(r.getString(2)))
    if (unknown.nonEmpty)
      Metrics.global.inc("graft_walkserve_unknown_tenant_total",
        unknown.length.toLong)
    // one surviving row per (q_id, tenant): a transport duplicate must
    // not trip the walk's q_id-uniqueness contract
    val dedup = known.distinctBy(r => (r.getLong(0), r.getString(2)))
    if (dedup.isEmpty) None
    else if (dedup.map(_.getLong(0)).distinct.length < dedup.length) {
      Metrics.global.inc("graft_walkserve_qid_collision_batches_total")
      val perTenant = dedup.groupBy(_.getString(2)).toSeq.sortBy(_._1)
        .map { case (tenant, trs) =>
          val local = trs.toSeq
            .map(r => (r.getLong(0), r.getSeq[Float](1)))
            .toDF("q_id", "q_emb")
          handle.topK(local, k, allowlists(tenant))
            .withColumn("tenant",
              org.apache.spark.sql.functions.lit(tenant))
        }
      perTenant.reduceOption(_ unionByName _)
        .map(df => (df, dedup.length.toLong))
    } else {
      val local = dedup.toSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getString(2)))
        .toDF("q_id", "q_emb", "tenant")
      // served-query count excludes the dropped unknown tenants
      Some((handle.topKTenants(local, k, allowlists), dedup.length.toLong))
    }
  }

  /** The shared micro-batch serving loop behind [[start]] and
    * [[startTenants]]: per batch — collect (broadcast-small by the
    * Handle contract), staleness-aware reopen, answer, marker-committed
    * epoch dir, counters, and the loop-local fold cadence.
    */
  private def serveLoop(queries: DataFrame, packDir: String, outDir: String,
      checkpointDir: String, triggerMs: Long, foldEvery: Int,
      collectBatch: DataFrame => Array[org.apache.spark.sql.Row],
      answer: (GraphServing.Handle, Array[org.apache.spark.sql.Row])
        => Option[(DataFrame, Long)],
      tenanted: Boolean = false, extraClose: () => Unit = () => ())(
      implicit spark: SparkSession): Serving = {
    // the serving MODE is outDir state, recorded up front: results()'s
    // empty-store fallback must carry the mode's real schema (a
    // tenant-mode consumer selecting `tenant` before the first commit
    // gets an empty frame, not an AnalysisException), and a plain loop
    // pointed at a tenant-mode store is a schema mismatch caught here
    // instead of at the first fold
    {
      val marker = new org.apache.hadoop.fs.Path(outDir, TenantModeMarker)
      val fs = fsOf(spark, outDir)
      if (tenanted) {
        if (!fs.exists(marker)) fs.create(marker, true).close()
      } else if (fs.exists(marker))
        throw new IllegalStateException(
          s"$outDir already serves TENANT mode — one serving mode per outDir")
    }
    val handleRef = new java.util.concurrent.atomic.AtomicReference(
      GraphServing.open(spark, packDir))
    val closer = () => {
      val h = handleRef.getAndSet(null)
      if (h != null) h.close()
      extraClose()
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
    // STREAM-IDENTITY guard: the fold watermark cannot distinguish a
    // checkpoint REPLAY (same stream re-running a folded epoch — its dir
    // rewrite is correctly invisible) from a RESET (fresh checkpoint on a
    // reused outDir — epochs restart at 0 BELOW the watermark, so newly
    // served batches would be invisible to results() and then vacuumed:
    // silent data loss under an ordinary ops misstep). The streaming
    // query id IS the distinguisher — it persists in the checkpoint, so
    // a restart keeps it and a reset mints a new one. The id is stamped
    // into the outDir at the first batch and every later serve of a
    // non-empty outDir under a DIFFERENT id fails fast. The id is only
    // known after start(), so the first batch spin-waits on the
    // hand-off ref (bounded — the caller sets it right after start
    // returns; stream threads are separate by construction).
    val qidRef = new java.util.concurrent.atomic.AtomicReference[String]
    var identityChecked = false
    val query = try { queries.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!identityChecked) {
          var qid = qidRef.get()
          while (qid == null) { Thread.sleep(1); qid = qidRef.get() }
          checkStreamIdentity(spark, outDir, qid)
          identityChecked = true
        }
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
    qidRef.set(query.id.toString) // unblocks the first batch's guard
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
        // driver-side read (MetaIO): the fold watermark is consulted by
        // results()/fold()/vacuum() — no Spark job for a one-row record
        val r = graft.queries.MetaIO.readHead(
          spark, s"${foldMetaDir(outDir)}/e$e")
        (e, r.getLong("folded_through"))
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
    val mp = s"${foldMetaDir(outDir)}/e$next"
    graft.queries.MetaIO.writeRow(spark, mp,
      "epoch" -> next, "folded_through" -> fresh.max)
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
    if (dirs.isEmpty) {
      // typed empty frame in the MODE'S real schema (the mode marker is
      // written at loop start, before any commit): a tenant-mode
      // consumer filtering on `tenant` pre-first-commit gets an empty
      // frame — not an AnalysisException — and a unionByName with later
      // real results cannot type-mismatch
      import org.apache.spark.sql.types._
      val tenanted = fsOf(spark, outDir).exists(
        new org.apache.hadoop.fs.Path(outDir, TenantModeMarker))
      val fields = Seq(StructField("q_id", LongType),
          StructField("rnk", IntegerType),
          StructField("vec_id", LongType),
          StructField("cos", DoubleType)) ++
        (if (tenanted) Seq(StructField("tenant", StringType)) else Nil) :+
        StructField("batch", LongType)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(fields))
    } else spark.read.parquet(dirs: _*)
  }

  /** RETENTION on the serving results: [[fold]] first (so everything
    * served is in the folded store), then rewrite that store keeping
    * only rows with `batch >= belowBatch` — the answer to [[results]]'s
    * "everything served so far" contract being unbounded OUTPUT at
    * server uptimes (fold/vacuum bound the directory COUNT; this bounds
    * the rows). The fold WATERMARK is carried unchanged, so a replay of
    * a retained epoch stays below it and invisible — retention can never
    * re-open the door to a double-serve. Same single-writer contract as
    * [[fold]] (with `foldEvery > 0` the loop owns the fold cadence — run
    * retention from the loop's owner while it is stopped, or own the
    * cadence externally with `foldEvery = 0`). Returns rows dropped;
    * superseded fold epochs and batch dirs are vacuumed.
    */
  def retain(spark: SparkSession, outDir: String, belowBatch: Long): Long = {
    import org.apache.spark.sql.functions.{col, count, lit, when}
    fold(spark, outDir)
    val (fEpoch, through) = foldState(spark, outDir)
    if (fEpoch < 0) return 0L
    // the rewrite READS the committed epoch dir and WRITES the next one —
    // disjoint paths, and the vacuum that drops the old dir runs only
    // after the new epoch's meta committed, so no pinning is needed; one
    // combined-count pass + one rewrite pass is the whole cost
    val cur = spark.read.parquet(foldedDir(outDir, fEpoch))
    val cnt = cur.agg(count(lit(1)).as("total"),
      count(when(col("batch") >= belowBatch, 1)).as("kept")).head
    val (total, keptN) = (cnt.getLong(0), cnt.getLong(1))
    if (keptN == total) { vacuum(spark, outDir); return 0L }
    clearDirsAbove(spark, s"$outDir/folded", fEpoch)
    clearDirsAbove(spark, foldMetaDir(outDir), fEpoch)
    val next = fEpoch + 1
    val kept = cur.filter(col("batch") >= belowBatch)
    // a zero-row store still lands one schema-bearing file (the
    // engine's empty-write idiom), so results() keeps its schema
    (if (keptN == 0) kept.coalesce(1) else kept)
      .write.mode("overwrite").parquet(foldedDir(outDir, next))
    val mp = s"${foldMetaDir(outDir)}/e$next"
    graft.queries.MetaIO.writeRow(spark, mp,
      "epoch" -> next, "folded_through" -> through)
    fsOf(spark, mp).create(
      new org.apache.hadoop.fs.Path(mp, CommitMarker), true).close()
    vacuum(spark, outDir)
    Metrics.global.inc("graft_walkserve_retained_rows_total",
      total - keptN)
    total - keptN
  }

  /** One listing + the loop's per-JVM counters — no data read. `liveBatchDirs`
    * counts committed dirs above the fold watermark (what [[results]]
    * unions beside the folded store); the counters are process-global
    * across every loop in this JVM (the [[Metrics]] registry contract).
    */
  final case class ServeLoopStats(foldEpoch: Int, foldedThrough: Long,
      liveBatchDirs: Int, batches: Long, queries: Long, reopens: Long,
      folds: Long, unknownTenants: Long = 0L, qidCollisions: Long = 0L,
      tenantReloads: Long = 0L, retainedRows: Long = 0L)

  def describe(spark: SparkSession, outDir: String): ServeLoopStats = {
    val (fEpoch, through) = foldState(spark, outDir)
    ServeLoopStats(fEpoch, through,
      committedBatchEpochs(spark, outDir).count(_ > through),
      Metrics.global.value("graft_walkserve_batches_total"),
      Metrics.global.value("graft_walkserve_queries_total"),
      Metrics.global.value("graft_walkserve_reopens_total"),
      Metrics.global.value("graft_walkserve_folds_total"),
      Metrics.global.value("graft_walkserve_unknown_tenant_total"),
      Metrics.global.value("graft_walkserve_qid_collision_batches_total"),
      Metrics.global.value("graft_walkserve_tenant_reloads_total"),
      Metrics.global.value("graft_walkserve_retained_rows_total"))
  }
}
