package graft
import org.apache.spark.sql.SparkSession

/** BENCH harness (BASELINE.md): runs every catalog query at the sf-dir from
  * SPARK_GRAFT_SF_DIR, prints one JSON line of per-query wall-clock seconds.
  *
  * Queries run in sorted-name order so timings attribute deterministically,
  * after a short warmup (scans all tables + one agg + one vector query) so
  * the first timed query doesn't absorb JIT/codegen/classloading cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q_a,q_b limits the run (local iteration on a hot
    // spot); the driver never sets it, so recorded rounds are always full.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_PIPELINE_ONLY=1: skip the catalog, measure just the two
    // sink modes (local iteration on the sink path); driver never sets it
    if (sys.env.get("SPARK_GRAFT_PIPELINE_ONLY").contains("1")) {
      val line = (1 to 3).map { i =>
        val d = pipelineThroughput(spark, executorSide = false)
        val x = pipelineThroughput(spark, executorSide = true)
        s"""{"pass":$i,"driver_upserts_per_s":$d,"executor_upserts_per_s":$x}"""
      }.mkString("\n")
      println(line)
      spark.stop(); println(line); System.out.flush()
      return
    }
    // bench=false rows (the q_index_fresh CDC flow) stay correctness-gated
    // in Verify/CORRECTNESS but are excluded from the TIMED catalog: their
    // cost is per-epoch filesystem-commit overhead, size-independent by
    // construction (bounded corpus slice + bounded CDC batch), so timing
    // them as "queries" would only add a constant to the total — the loop's
    // real rate is priced by indexsync_upserts_per_s below. An explicit
    // SPARK_GRAFT_ONLY naming such a row still times it.
    val qs = graft.queries.Catalog.all
      .filter(q => q.bench || only.exists(_(q.name)))
      .map(q => q.name -> q.fn).toMap
      .filter { case (name, _) => only.forall(_(name)) }
    // Warmup: run the whole catalog once at the smallest sf before timing.
    // Generated code is data-independent, so this compiles every query's
    // codegen units (Janino), loads the classes, and JITs the hot paths for
    // pennies — the timed pass then measures the engine, not first-run JVM
    // compilation (measured: the heavy dedup queries are 13.7 s cold vs
    // 2.9 s warm at sf0.1 on identical plans). Falls back to the target sf
    // if the warmup dir is absent.
    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(d => new java.io.File(d).isDirectory).getOrElse(sfDir)
    qs.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    // A thrown query records the -1.0 sentinel (and its name under "failed"),
    // never its time-to-failure — breakage must not read as a timing.
    //
    // Timed iterations are FULL CATALOG PASSES, min per query across passes
    // (declared in the JSON): this VM shows transient multi-minute host-noise
    // windows (the same warmed query measured 2.8 s and 12.6 s in
    // back-to-back runs; the r3 recording shows an alphabetically-contiguous
    // block of queries 5-20× slow — one window poisoning consecutive
    // back-to-back timings). Interleaving puts a whole catalog pass
    // (~30-60 s) between a query's two timings, so a single window cannot
    // claim both.
    val iterations = 5
    val named = qs.toSeq.sortBy(_._1)
    // NOISE SENTINEL (VERDICT r8 item 1): a fixed in-memory computation —
    // no I/O, no shuffle variance, identical work every time — timed once
    // per pass. Its spread across passes is a direct read of host noise
    // during THIS bench window: a quiet box repeats it within ~10%, and a
    // sentinel_spread of 2-3× says the per-query numbers carry the same
    // inflation and must be judged against BENCH_scale / a re-run, not
    // read as regressions. Recorded in every BENCH JSON from now on.
    def sentinel(): Double = sentinelSec(spark, cpus.toInt)
    // warm the sentinel's own codegen/JIT to steady state before the
    // recorded passes — a decaying first reading would mimic host noise
    (1 to 3).foreach(_ => sentinel())
    // One timed ATTEMPT = `iterations` full interleaved catalog passes
    // with a sentinel reading per pass. The steady-state spread (passes
    // 2+ — the FIRST sentinel runs on a warm quiet heap and is
    // systematically faster, which is measurement context, not noise)
    // is the quiet-window gate: the repo's own comparison bar is < 2.
    def timedAttempt()
        : (Seq[Map[String, Double]], Seq[Double], Double, Double) = {
      val sents = scala.collection.mutable.ArrayBuffer[Double]()
      val ps: Seq[Map[String, Double]] = (1 to iterations).map { _ =>
        sents += math.round(sentinel() * 1000.0) / 1000.0
        named.map { case (name, fn) =>
          val t0 = System.nanoTime()
          name -> (try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
                   catch { case _: Throwable => -1.0 })
        }.toMap
      }
      val spread =
        math.round(sents.max / math.max(sents.min, 1e-9) * 100.0) / 100.0
      val steady = if (sents.length > 1) sents.drop(1) else sents
      val spreadSteady =
        math.round(steady.max / math.max(steady.min, 1e-9) * 100.0) / 100.0
      (ps, sents.toSeq, spread, spreadSteady)
    }
    // SENTINEL-GATED recording (r16 verdict, process): a recording taken
    // in a noisy host window (steady spread >= 2) is retried — bounded —
    // and the QUIETEST attempt is kept; if every attempt was noisy the
    // record carries "noisy":true so a reader never mistakes window
    // inflation for a plan regression. The r16 end-of-round record
    // (spread 5.22, uniformly ~1.23x the quiet snapshot) is exactly the
    // artifact this gate retires.
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_QUIET_ATTEMPTS", "3").toInt
    var best = timedAttempt()
    var attempts = 1
    while (best._4 >= 2.0 && attempts < maxAttempts) {
      val next = timedAttempt()
      if (next._4 < best._4) best = next
      attempts += 1
    }
    val (passes, sentinelSeq, sentinelSpread, sentinelSpreadSteady) = best
    val noisy = sentinelSpreadSteady >= 2.0
    val sentinelJson = sentinelSeq.mkString("[", ",", "]")
    val results = named.map { case (name, _) =>
      val times = passes.map(_(name))
      name -> (if (times.exists(_ < 0)) -1.0
               else math.round(times.min * 1000.0) / 1000.0)
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = math.round(results.map(_._2).filter(_ >= 0).sum * 1000.0) / 1000.0
    // Pipeline gets its own noise treatment (declared separately below as
    // "pipeline_iterations" — "iterations" describes only the query passes):
    // full runs, best sustained rate kept (throughput: higher = less
    // interference). Fewer passes than the queries because one run is ~4 s
    // of sustained load, long enough to average over a noise window.
    val pipelineIterations = 2
    // subset runs are query-iteration loops — skip the pipeline metric
    val ups = if (only.isDefined) -1.0
      else (1 to pipelineIterations)
        .map(_ => pipelineThroughput(spark, executorSide = false)).max
    // the 100 TB sink path (per-partition sender) gets the SAME best-of
    // treatment as the driver loop — one sample per mode made the r8
    // driver-vs-executor comparison a coin flip in a noisy window
    val upsExec = if (only.isDefined) -1.0
      else (1 to pipelineIterations)
        .map(_ => pipelineThroughput(spark, executorSide = true)).max
    // the namesake sync→index loop (VERDICT r10 item 1): CDC events through
    // IndexSync.start into a live IndexedLayout — executor-native, so this
    // number is the cluster's, not the driver heap's
    val upsIdx = if (only.isDefined) -1.0
      else (1 to pipelineIterations)
        .map(_ => indexsyncThroughput(spark, sfDir)).max
    // the LEXICAL twin of the loop above: doc CDC through LexIndexSync
    // into a live InvertedIndex, compaction policy on
    val docsLex = if (only.isDefined) -1.0
      else (1 to pipelineIterations)
        .map(_ => lexsyncThroughput(spark, sfDir)).max
    // the AGGREGATE twin: base-row CDC through MatViewSync into a live
    // materialized view, compaction policy on
    val rowsMv = if (only.isDefined) -1.0
      else (1 to pipelineIterations)
        .map(_ => mvsyncThroughput(spark, sfDir)).max
    // the graph-walk SERVING rates: the bare walk (beam search through a
    // warm handle — the number a user choosing between the brute/IVF/
    // graph regimes compares) and the full STREAMING loop (WalkServe:
    // staleness probe + walk + marker-committed writes + in-loop
    // fold/vacuum per batch — what a deployment sizing the serving tier
    // pays). ONE untimed fixture (graph + pack) serves both probes —
    // building it twice was the bench's most expensive redundancy.
    val (qpsWalk, walkPassSec, walkSentinel, qpsServe, servePassSec,
        qpsTenants, tenantsPassSec) =
      if (only.isDefined)
        (-1.0, Seq.empty[Double], -1.0, -1.0, Seq.empty[Double],
          -1.0, Seq.empty[Double])
      else {
        val (gDir, pDir) = serveFixture(spark, sfDir)
        // 3 timed passes (one more than the other probes): this rate is
        // min-of-~2 s passes and the most window-sensitive number in the
        // record — the extra pass materially stabilizes the min
        val (walk, passSec, sentAdj) =
          graphsearchThroughput(spark, sfDir, 3, pDir, cpus.toInt)
        val (serve, servePass) = walkserveThroughput(spark, sfDir, pDir)
        val (tenants, tenantsPass) =
          walkserveTenantsThroughput(spark, sfDir, pDir)
        Seq(gDir, pDir).foreach(d =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
        (walk, passSec, sentAdj, serve, servePass, tenants, tenantsPass)
      }
    val walkReceipt =
      s""""graphsearch_pass_sec":${walkPassSec.mkString("[", ",", "]")},""" +
      s""""graphsearch_sentinel_sec":$walkSentinel,""" +
      s""""walkserve_pass_sec":${servePassSec.mkString("[", ",", "]")},""" +
      s""""walkserve_tenants_pass_sec":${tenantsPassSec.mkString("[", ",", "]")},"""
    val sha = gitSha() // once — both JSON lines carry it
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,""" +
      s""""failed":$failed,"pipeline_upserts_per_s":$ups,""" +
      s""""pipeline_upserts_per_s_executor_sink":$upsExec,""" +
      s""""indexsync_upserts_per_s":$upsIdx,""" +
      s""""lexsync_docs_per_s":$docsLex,""" +
      s""""mvsync_rows_per_s":$rowsMv,""" +
      s""""graphsearch_queries_per_s":$qpsWalk,""" + walkReceipt +
      s""""walkserve_queries_per_s":$qpsServe,""" +
      s""""walkserve_tenants_queries_per_s":$qpsTenants,""" +
      s""""iterations":$iterations,"pipeline_iterations":$pipelineIterations,""" +
      s""""sentinel_sec":$sentinelJson,"sentinel_spread":$sentinelSpread,""" +
      s""""sentinel_spread_steady":$sentinelSpreadSteady,""" +
      s""""noisy":$noisy,"attempts":$attempts,"git_sha":"$sha",""" +
      s""""stat":"min","sf":"$sfDir"}"""
    println(line)
    // Tail-capture defense: BENCH_r04/r05 both recorded `parsed: null`
    // because executor-shutdown WARN spam after this point pushed the metric
    // line out of the driver's captured tail. Persist it to a sidecar file
    // and RE-print it after spark.stop(), flushed, as the process's final
    // stdout line — whichever channel survives, the record does.
    // ... and into the working directory (BENCH_local_last.json), so the
    // full per-query map can be COMMITTED per round (BENCH_local_r<N>) —
    // cross-round per-query comparisons must not depend on /tmp surviving
    Seq("/tmp/bench_last.json", "BENCH_local_last.json").foreach { p =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (line + "\n").getBytes("UTF-8"))
      catch { case _: java.io.IOException => }
    }
    spark.stop()
    println(line)
    // The driver keeps only a ~2,000-char stdout tail; the full per-query
    // line is ~2.6 KB, so its head (and the opening brace) can be cut off
    // and the parse fails (r4-r6 all recorded `parsed: null`). Print a
    // compact summary — same headline numbers, no per-query map — as the
    // process's very last stdout line; it fits any tail window.
    val compact = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""failed":$failed,"pipeline_upserts_per_s":$ups,""" +
      s""""pipeline_upserts_per_s_executor_sink":$upsExec,""" +
      s""""indexsync_upserts_per_s":$upsIdx,""" +
      s""""lexsync_docs_per_s":$docsLex,""" +
      s""""mvsync_rows_per_s":$rowsMv,""" +
      s""""graphsearch_queries_per_s":$qpsWalk,""" + walkReceipt +
      s""""walkserve_queries_per_s":$qpsServe,""" +
      s""""walkserve_tenants_queries_per_s":$qpsTenants,""" +
      s""""sentinel_spread":$sentinelSpread,""" +
      s""""sentinel_spread_steady":$sentinelSpreadSteady,""" +
      s""""noisy":$noisy,"attempts":$attempts,"git_sha":"$sha",""" +
      s""""n_queries":${results.size},"sf":"$sfDir"}"""
    println(compact)
    System.out.flush()
  }

  /** The noise sentinel as a reusable probe: a fixed in-memory
    * computation (no I/O, no shuffle variance, identical work every
    * time) whose duration is a direct read of host noise at the moment
    * it runs — taken once per catalog pass AND adjacent to the
    * walk-serving probe (whose min-of-passes rate is driver-job-latency
    * bound and so swings hard with the host window; the r17 107.8 → 80
    * move was unexplainable without a reading taken NEXT TO the probe).
    */
  private def sentinelSec(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 50000000L, 1L, cpus)
      .selectExpr("sum(cast(hash(id) as bigint))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** BASELINE.md pipeline gate: sustain ≥100 upserts/s (10× the reference's
    * config-implied ceiling of 50 per 5 s flush) through the real streaming
    * path — MemoryStream → keyed debounce state → foreachBatch payload sink.
    */
  private def pipelineThroughput(
      spark: SparkSession, executorSide: Boolean): Double = {
    import graft.pipeline._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[ResourceEventRow] =
      org.apache.spark.sql.Encoders.product[ResourceEventRow]
    val n = 20000
    // executor mode serializes the sink per task — a captured driver local
    // would increment a deserialized copy; the companion-object counter is
    // classloader-shared in local mode (the SyncPipelineSpec pattern)
    BenchExecCollector.delivered.set(0)
    val delivered = BenchExecCollector.delivered
    val sink = new RestSink(
      post = p => { BenchExecCollector.delivered.addAndGet(countIds(p)); 200 },
      sleep = _ => (), jitter = () => 1.0)
    val source = MemoryStream[ResourceEventRow]
    // reference-named env config (A20) with bench-friendly debounce/flush
    val cfg = SyncPipeline.Config.fromEnv(sys.env ++ Map(
      "DEBOUNCE_WINDOW_MS" -> sys.env.getOrElse("BENCH_DEBOUNCE_MS", "300"),
      "BATCH_FLUSH_INTERVAL_MS" -> "100"))
      .copy(checkpointDir =
        java.nio.file.Files.createTempDirectory("bench_ckpt").toString,
        executorSideSink = executorSide)
    val query = SyncPipeline.start(source.toDS(), sink, cfg)
    val t0 = System.nanoTime()
    try {
      val ts = new java.sql.Timestamp(0)
      (0 until n).grouped(2000).foreach { chunk =>
        source.addData(chunk.map(i => ResourceEventRow(
          "ADD", i.toLong, ts, s"ns/apps/v1/Deployment/app-$i", "ns", s"app-$i",
          "Deployment", "apps/v1", "apps", Map("i" -> i.toString), null, ts)))
      }
      val deadline = System.currentTimeMillis() + 120000
      while (delivered.get() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally query.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    if (delivered.get() < n) -1.0 else math.round(n / secs * 10.0) / 10.0
  }


  /** Cumulative input-row tally keyed by query id — NOT recentProgress,
    * whose bounded ring (default 100 entries) can shed early batches and
    * undercount. Construct BEFORE starting the query so no progress
    * event predates it; events for other queries are kept under their
    * own id and ignored. One implementation for every throughput probe —
    * the counting subtlety must not live in two places.
    */
  private final class InputRowTally(spark: SparkSession) extends AutoCloseable {
    private val rows =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]
    private val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        rows.merge(e.progress.id, e.progress.numInputRows, (a, b) => a + b)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    def committed(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      rows.getOrDefault(q.id, 0L)
    override def close(): Unit = spark.streams.removeListener(listener)
  }

  /** The sync→index loop's sustained rate: a live [[graft.queries.IndexedLayout]]
    * bootstrapped over the bench corpus absorbs a churning upsert CDC through
    * [[graft.pipeline.IndexSync.start]] (layout side; the graph side's delta
    * cost is priced separately by the knn-graph catalog rows). Events stream
    * via MemoryStream, so batching is Spark's own; the rate is events
    * absorbed-and-committed per second including every applyDelta epoch's
    * staging + promote + meta commit, with the periodic compaction policy ON
    * (compactEvery=4) so the number prices the full churn-proof loop.
    */
  private def indexsyncThroughput(spark: SparkSession, sfDir: String): Double = {
    import graft.pipeline._
    import graft.pipeline.VectorSync.VecEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[VecEvent] =
      org.apache.spark.sql.Encoders.product[VecEvent]
    val layoutDir =
      java.nio.file.Files.createTempDirectory("bench_isync_layout").toString
    graft.queries.IndexedLayout.write(spark,
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"), layoutDir)
    // event fixture: 6× churn over 500 live ids (driver-built — fixture
    // creation, not the measured path)
    val baseVecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").limit(500).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = 3000
    val events = (0 until n).map { i =>
      val (id, v) = baseVecs(i % baseVecs.length)
      VecEvent("UPDATE", i.toLong, id, v.map(x => x * (1.0f + 0.001f * (i % 7))), 0)
    }
    val before = Metrics.global.value("graft_indexsync_upserts_total") +
      Metrics.global.value("graft_indexsync_deletes_total")
    def appliedDelta() = Metrics.global.value("graft_indexsync_upserts_total") +
      Metrics.global.value("graft_indexsync_deletes_total") - before
    val source = MemoryStream[VecEvent]
    val tally = new InputRowTally(spark)
    val query = IndexSync.start(source.toDS(), layoutDir, null,
      java.nio.file.Files.createTempDirectory("bench_isync_ckpt").toString,
      triggerMs = 50, compactEvery = 4)
    def committed(): Long = tally.committed(query)
    val t0 = System.nanoTime()
    try {
      events.grouped(500).foreach(chunk => source.addData(chunk))
      val deadline = System.currentTimeMillis() + 120000
      // each epoch dedups to last-state-wins, so the APPLIED count is the
      // surviving-key count per batch, <= n; completion = every input row
      // went through a committed batch (progress reports post-commit)
      while (committed() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally {
      query.stop()
      tally.close()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val absorbed = appliedDelta()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(layoutDir))
    // a deadline expiry means fewer than n events were absorbed — n/secs
    // would overstate the rate, so the run reports failure instead
    if (absorbed <= 0 || committed() < n) -1.0
    else math.round(n / secs * 10.0) / 10.0
  }

  /** The lexical loop's sustained rate: a live [[graft.queries.InvertedIndex]]
    * bootstrapped over the bench corpus absorbs a churning document-update
    * CDC through [[graft.pipeline.LexIndexSync.start]], compaction policy ON
    * — the rate prices tokenize + delete-then-append epochs + periodic
    * compaction, end to end. Same cumulative-listener completion tally and
    * deadline-failure semantics as [[indexsyncThroughput]].
    */
  private def lexsyncThroughput(spark: SparkSession, sfDir: String): Double = {
    import graft.pipeline._
    import graft.pipeline.LexIndexSync.DocEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[DocEvent] =
      org.apache.spark.sql.Encoders.product[DocEvent]
    val indexDir =
      java.nio.file.Files.createTempDirectory("bench_lexsync_idx").toString
    graft.queries.InvertedIndex.build(spark,
      Tables.documents(spark, sfDir).select("doc_id", "text"), indexDir)
    val n = 2000
    val events = (0 until n).map { i =>
      DocEvent("UPDATE", i.toLong, (i % 200).toLong,
        s"dup churn pass${i / 200} token${i % 17} merge window sort")
    }
    val tally = new InputRowTally(spark)
    val source = MemoryStream[DocEvent]
    val query = LexIndexSync.start(source.toDS(), indexDir,
      java.nio.file.Files.createTempDirectory("bench_lexsync_ckpt").toString,
      triggerMs = 50, compactEvery = 4)
    def committed(): Long = tally.committed(query)
    val t0 = System.nanoTime()
    try {
      events.grouped(500).foreach(chunk => source.addData(chunk))
      val deadline = System.currentTimeMillis() + 120000
      while (committed() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally {
      query.stop()
      tally.close()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(indexDir))
    if (committed() < n) -1.0 else math.round(n / secs * 10.0) / 10.0
  }

  /** The aggregate-view loop's sustained rate: a live
    * [[graft.queries.MatView]] bootstrapped over the bench orders absorbs
    * a churning insert/retract CDC through
    * [[graft.pipeline.MatViewSync.start]], compaction policy ON — the
    * rate prices the signed-partials refresh + the meta-commit replay
    * gate + periodic log consolidation. Same cumulative-listener
    * completion tally and deadline-failure semantics as the other loops.
    */
  private def mvsyncThroughput(spark: SparkSession, sfDir: String): Double = {
    import graft.pipeline._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(String, Long, Double)] =
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble)
    val viewDir =
      java.nio.file.Files.createTempDirectory("bench_mvsync_view").toString
    graft.queries.MatView.bootstrap(spark,
      Tables.orders(spark, sfDir).select(
        org.apache.spark.sql.functions.col("o_custkey").as("k"),
        org.apache.spark.sql.functions.col("o_totalprice").as("v")),
      Seq("k"), Seq("v"), viewDir)
    val n = 2000
    // every 4th event retracts the row its predecessor inserted (stream
    // order guarantees the insert's epoch is not after the delete's), so
    // the probe prices BOTH verbs under churn
    val events = (0 until n).map { i =>
      if (i % 4 == 3) ("DELETE", (i - 1) % 200L, (i - 1) * 0.5)
      else ("INSERT", i % 200L, i * 0.5)
    }
    val tally = new InputRowTally(spark)
    val source = MemoryStream[(String, Long, Double)]
    val query = MatViewSync.start(source.toDS().toDF("op", "k", "v"), viewDir,
      java.nio.file.Files.createTempDirectory("bench_mvsync_ckpt").toString,
      triggerMs = 50, compactEvery = 4)
    def committed(): Long = tally.committed(query)
    val t0 = System.nanoTime()
    try {
      events.grouped(500).foreach(chunk => source.addData(chunk))
      val deadline = System.currentTimeMillis() + 120000
      while (committed() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally {
      query.stop()
      tally.close()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(viewDir))
    if (committed() < n) -1.0 else math.round(n / secs * 10.0) / 10.0
  }

  /** The shared UNTIMED serving fixture: a persisted k-NN graph and its
    * serving pack over the bench corpus (IndexSync + refresh maintain
    * them in production — fixture cost must not ride a serving rate).
    * Returns (graphDir, packDir); the caller deletes both after the
    * probes that share them.
    */
  private def serveFixture(spark: SparkSession,
      sfDir: String): (String, String) = {
    val graphDir =
      java.nio.file.Files.createTempDirectory("bench_gsearch").toString
    val packDir =
      java.nio.file.Files.createTempDirectory("bench_gsearch_pack").toString
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .localCheckpoint()
    graft.queries.KnnGraphBuild.build(spark, e, graphDir, k = 5)
    graft.queries.GraphServing.build(spark, graphDir, e, packDir)
    graft.Release.checkpoint(e)
    (graphDir, packDir)
  }

  /** The graph-walk serving rate: queries/s answered by a warm
    * [[graft.queries.GraphServing.Handle]] over the shared
    * [[serveFixture]] pack — the index-regime serving path
    * (bucket-pruned adjacency + vector point lookups, pinned centroid
    * seeds and walk parameters). The timed region is EXACTLY the walk
    * rounds. Runs `passes`×, best kept (the throughput noise treatment).
    * Relating the regimes: brute touches the whole corpus per batch, IVF
    * reads nprobe cells, the walk reads its frontier's buckets and
    * scores beam×degree×iters candidates per query — the serving cost a
    * user actually compares.
    */
  private def graphsearchThroughput(spark: SparkSession, sfDir: String,
      passes: Int, packDir: String, cpus: Int)
      : (Double, Seq[Double], Double) = {
    import org.apache.spark.sql.functions.col
    // the RAM serving tier (pin = true): the pack loads into cluster
    // memory once at open — what a hot deployment runs, and the tier
    // whose per-round shape matches the pre-pack recordings; the disk
    // tier's scaling is priced separately by BENCH_scale's
    // graph_walk_serve probe
    val h = graft.queries.GraphServing.open(spark, packDir, pin = true)
    val nQ = 200
    val q = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    // one UNTIMED warmup: the walk's codegen units compile on the first
    // pass over this fixture (the catalog warmup never touches the pack
    // plans), and every recorded round's pass-1 reading was inflated by
    // exactly that — warm first, then time, like the catalog does
    h.topK(q, k = 5).count()
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val n = h.topK(q, k = 5).count()
      if (n <= 0) Double.MaxValue else (System.nanoTime() - t0) / 1e9
    }
    // the NOISE RECEIPT (VERDICT r17 item 3): this probe's timed region
    // is ~2 s of walk rounds driven by ~6-8 driver jobs, so a slow host
    // phase inflates it far more than the catalog's long queries — a
    // sentinel reading taken IMMEDIATELY beside the probe (plus the raw
    // per-pass times) lets a reader separate a serving regression (pass
    // times up, sentinel quiet) from a window artifact (both up)
    val sentAdj = sentinelSec(spark, cpus)
    h.close() // the RAM tier pinned the whole pack — release it eagerly
    graft.Release.checkpoint(q)
    val best = times.min
    val rate =
      if (best == Double.MaxValue) -1.0
      else math.round(nQ / best * 10.0) / 10.0
    (rate,
      times.map(t => if (t == Double.MaxValue) -1.0
        else math.round(t * 1000.0) / 1000.0),
      math.round(sentAdj * 1000.0) / 1000.0)
  }

  /** The MULTI-TENANT streaming loop's sustained rate: every micro-batch
    * mixes queries from 8 tenants (distinct allowlists, fail-closed
    * routing) and must answer them in ONE walk
    * ([[graft.pipeline.WalkServe.startTenants]] →
    * [[graft.queries.GraphServing.Handle.topKTenants]]) — the rate a
    * tenant fleet's serving tier is sized by, and the number that keeps
    * the batched-walk path honest against the single-tenant
    * `walkserve_queries_per_s` (the r17 serial form paid O(tenants)
    * walks per batch; this loop would have priced it).
    */
  private def walkserveTenantsThroughput(spark: SparkSession, sfDir: String,
      packDir: String, passes: Int = 2): (Double, Seq[Double]) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import s.implicits._
    val nT = 8
    val allows = (0 until nT).map(i => s"t$i" ->
      Tables.embeddings(spark, sfDir).select("vec_id")
        .filter(col("vec_id") % nT === i).localCheckpoint()).toMap
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .filter(col("vec_id") < 200).collect()
      .map(_.getSeq[Float](1))
    // one streaming run = one pass; fresh outDir/ckpt per run (the loop's
    // stream-identity guard correctly rejects a reused outDir under a new
    // checkpoint). foldEvery is 1 on the warm run so fold/vacuum codegen
    // compiles there, 4 on timed runs (the deployment cadence).
    def onePass(batches: Int, foldEvery: Int): Double = {
      val outDir =
        java.nio.file.Files.createTempDirectory("bench_wserve_t_o").toString
      val ckpt =
        java.nio.file.Files.createTempDirectory("bench_wserve_t_c").toString
      val n = batches * vecs.length
      val before = graft.pipeline.Metrics.global
        .value("graft_walkserve_queries_total")
      def served(): Long = graft.pipeline.Metrics.global
        .value("graft_walkserve_queries_total") - before
      val src = MemoryStream[(Long, Seq[Float], String)]
      val serving = graft.pipeline.WalkServe.startTenants(
        src.toDS().toDF("q_id", "q_emb", "tenant"), packDir, outDir, ckpt,
        allowlists = allows, k = 5, triggerMs = 50, foldEvery = foldEvery)
      val t0 = System.nanoTime()
      try {
        (0 until batches).foreach { b =>
          src.addData(vecs.zipWithIndex.map { case (v, j) =>
            (b * 1000L + j, v.toSeq, s"t${j % nT}") }.toSeq: _*)
        }
        val deadline = System.currentTimeMillis() + 120000
        while (served() < n && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      } finally serving.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      Seq(outDir, ckpt).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
      if (served() < n) Double.MaxValue else secs
    }
    // UNTIMED warm (the graphsearchThroughput rationale, r18): the
    // serving loop's codegen units — stream sink, batched tenant walk,
    // fold, vacuum — compile on the first run, and the single-shot form
    // recorded exactly that first-run penalty (tenants analog of the
    // single-tenant 13.4 s cold vs 8.0 s warm measurement)
    onePass(batches = 2, foldEvery = 1)
    val batches = 10
    val times = (1 to passes).map(_ => onePass(batches, foldEvery = 4))
    allows.values.foreach(graft.Release.checkpoint)
    val n = batches * vecs.length
    val best = times.min
    (if (best == Double.MaxValue) -1.0
     else math.round(n / best * 10.0) / 10.0,
     times.map(t => if (t == Double.MaxValue) -1.0
       else math.round(t * 1000.0) / 1000.0))
  }

  /** The STREAMING serving loop's sustained rate: query micro-batches
    * absorbed through [[graft.pipeline.WalkServe.start]] over a warm
    * pack with the FOLD CADENCE ON (foldEvery = 4) — each batch pays the
    * staleness meta probe, the pruned walk, the marker-committed result
    * write, and its share of the in-loop fold + vacuum, so the rate
    * prices the deployment loop, not just the walk
    * ([[graphsearchThroughput]] prices that). Runs over the shared
    * untimed [[serveFixture]] pack. Query ids are
    * unique per chunk so MemoryStream batch coalescing cannot undercount
    * the distinct-per-batch completion tally.
    */
  private def walkserveThroughput(spark: SparkSession, sfDir: String,
      packDir: String, passes: Int = 2): (Double, Seq[Double]) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import s.implicits._
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .filter(col("vec_id") < 200).collect()
      .map(_.getSeq[Float](1))
    def onePass(batches: Int, foldEvery: Int): Double = {
      val outDir =
        java.nio.file.Files.createTempDirectory("bench_wserve_o").toString
      val ckpt =
        java.nio.file.Files.createTempDirectory("bench_wserve_c").toString
      val n = batches * vecs.length
      val before = graft.pipeline.Metrics.global
        .value("graft_walkserve_queries_total")
      def served(): Long = graft.pipeline.Metrics.global
        .value("graft_walkserve_queries_total") - before
      val src = MemoryStream[(Long, Seq[Float])]
      val serving = graft.pipeline.WalkServe.start(
        src.toDS().toDF("q_id", "q_emb"), packDir, outDir, ckpt,
        k = 5, triggerMs = 50, foldEvery = foldEvery)
      val t0 = System.nanoTime()
      try {
        (0 until batches).foreach { b =>
          src.addData(vecs.zipWithIndex.map { case (v, j) =>
            (b * 1000L + j, v.toSeq) }.toSeq: _*)
        }
        val deadline = System.currentTimeMillis() + 120000
        while (served() < n && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      } finally serving.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      Seq(outDir, ckpt).foreach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
      if (served() < n) Double.MaxValue else secs
    }
    // UNTIMED warm + best-of-passes (r18 measurement fix, declared in
    // OPTIMIZATION_r18.md): the single-shot form recorded the serving
    // loop's FIRST-run codegen/JIT penalty — measured 13.4 s cold vs
    // 8.0 s warm for the identical run (rate 149 vs 249), which is the
    // entire r17→r18 headline swing on this row. Warm compiles the loop
    // (foldEvery = 1 so fold/vacuum compile too), then the timed passes
    // get the pipeline probes' best-of treatment; the raw pass seconds
    // ride the JSON as the noise receipt.
    onePass(batches = 2, foldEvery = 1)
    val batches = 10
    val times = (1 to passes).map(_ => onePass(batches, foldEvery = 4))
    val n = batches * vecs.length
    val best = times.min
    (if (best == Double.MaxValue) -1.0
     else math.round(n / best * 10.0) / 10.0,
     times.map(t => if (t == Double.MaxValue) -1.0
       else math.round(t * 1000.0) / 1000.0))
  }

  /** The tree the record was taken from — SPARK_GRAFT_GIT_SHA when the
    * caller pins it, else `git rev-parse HEAD` of the cwd ("" when
    * unavailable). Recorded so a committed BENCH snapshot is checkable
    * against the round's HEAD (the r16 process gap: the quiet recordings
    * predated the final commits and nothing said so).
    */
  private[graft] def gitSha(): String =
    sys.env.get("SPARK_GRAFT_GIT_SHA").getOrElse {
      try {
        val p = new ProcessBuilder("git", "rev-parse", "HEAD")
          .redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
        if (p.waitFor() == 0 && out.matches("[0-9a-f]{40}")) out else ""
      } catch { case _: Exception => "" }
    }

  /** Upserts per payload = createdAt fields: exactly one per instance and,
    * for the bench fixture built above (labels = Map("i" -> n), annotations
    * null), impossible inside a map. Not a general JSON parse — valid only
    * because Bench controls its own fixture.
    */
  private def countIds(payload: String): Long =
    "\"createdAt\":".r.findAllMatchIn(payload).length.toLong
}

/** Classloader-shared delivery counter for the executor-sink bench run. */
object BenchExecCollector {
  val delivered = new java.util.concurrent.atomic.AtomicLong
}
