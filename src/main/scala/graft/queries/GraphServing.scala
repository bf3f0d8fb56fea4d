package graft.queries

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INDEX-REGIME graph-walk serving — the persisted "serving pack" that
  * turns [[GraphSearch]]'s beam walk from a scan-regime operator (the
  * frame-based form re-derives the undirected closure, corpus norms and
  * walk parameters per CALL, and every round joins the frontier into
  * corpus-sized frames — measured near-linear, exponent 0.86 at ×5) into
  * the shape the engine's other serving paths already have
  * ([[InvertedIndex.bm25TopK]]'s pruned posting buckets, exponent −0.2;
  * [[IndexedLayout.prunedTopK]]'s pruned cells):
  *
  *   - the UNDIRECTED adjacency is persisted ONCE per graph epoch,
  *     Hive-partitioned by `hash(src) % Buckets` and sorted by `src`
  *     inside each bucket file, WITH THE DESTINATION VECTOR COLLOCATED
  *     ON THE EDGE ROW — the DiskANN layout (Subramanya et al., NeurIPS
  *     2019: vectors live beside the adjacency list precisely so one hop
  *     costs one read). A beam round is then ONE pruned scan: it reads
  *     only the frontier's buckets (planning-time partition pruning, the
  *     bounded driver bucket-list collect of the bm25TopK idiom) and the
  *     candidates arrive already carrying everything scoring needs — no
  *     second lookup, no corpus `nrmFrame`;
  *   - entry seeds ([[GraphSearch.centroidSeeds]] — one per quantizer
  *     centroid, reusing the graph's own pinned IVF quantizer when it
  *     has one) are persisted WITH their vectors, and the measured
  *     adaptive (beam, iters) operating point is pinned at build — a
  *     serving call does no corpus count and no kmeans. [[open]] returns
  *     a warm [[Handle]] that answers repeated query batches, the shape
  *     a real deployment runs.
  *
  * Per-query cost at 100 TB: scorings stay beam × degree × iters
  * (polylogarithmic — [[GraphSearch.adaptiveWalkParams]]); per-round I/O
  * is the frontier's buckets of the pack — frontier-proportional, never
  * corpus-proportional ([[Buckets]] is pinned at 16 for the fixture
  * scale; a production pack sizes it O(corpus partitions) so a batch's
  * frontier touches a vanishing fraction, and the src-sorted files let
  * parquet's row-group min/max prune WITHIN a bucket too). The DiskANN
  * collocation costs ~2k vector copies per vertex (undirected degree) —
  * deliberate write/space amplification buying one-read hops, the same
  * trade the paper makes on SSD.
  *
  * The pack is DERIVED state (rebuildable from the graph + corpus at any
  * time); it records the graph epoch it was built from, so staleness is
  * one [[isFresh]] check and refresh is a rebuild under the next pack
  * epoch — the committed-epoch commit protocol of [[EpochStore]],
  * single-writer like every store.
  */
object GraphServing {

  /** Src-hash fan-out of the adjacency store. Fixed at write time (the
    * pinned-quantizer analog): serving computes the same bucket with the
    * same expression, so pruning is correct across sessions.
    */
  val Buckets = 16

  import EpochStore.{CommitMarker, clearDirsAbove, committedEpochs, fsOf}

  private def metaDir(d: String) = s"$d/meta"
  private def adjDir(d: String, e: Int) = s"$d/adj/e$e"
  private def seedsDir(d: String, e: Int) = s"$d/seeds/e$e"

  private[queries] def bucketOfId(id: Column): Column =
    pmod(hash(id), lit(Buckets))

  /** Driver-side twin of [[bucketOfId]]: Spark's `hash()` over one LONG
    * column is Murmur3 (x86_32) of the value with seed 42 — pinned Spark
    * semantics (partitioned-table layouts depend on `hash()` stability),
    * and pinned HERE by GraphServingSpec asserting driver ≡ column over
    * the whole fixture id set. Lets a round derive its bucket list from
    * the already-collected frontier without a second Spark job.
    */
  private[queries] def bucketOfIdDriver(id: Long): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(id, 42)
    ((h % Buckets) + Buckets) % Buckets
  }

  /** (pack epoch, graph epoch built from, corpus size, pinned beam,
    * pinned iters).
    */
  final case class ServeMeta(epoch: Int, graphEpoch: Int, n: Long,
      beam: Int, iters: Int)

  /** Build (or refresh) the serving pack for the [[KnnGraphBuild]] state
    * at `graphDir` over its corpus `embeddings` — one corpus-sized pass
    * per graph epoch, paid at BUILD time so serving never pays it. A new
    * pack epoch lands under fresh dirs and flips live at the meta commit;
    * a crashed build's leftovers roll back on the next verb (the shared
    * [[EpochStore]] discipline). Returns the committed pack epoch.
    *
    * Maintenance-cost class: a refresh rewrites the pack in full — the
    * SAME O(n·k) per-refresh trade [[KnnGraphBuild]]'s own delta
    * documents for its merged edge list, and the same escape hatch
    * applies at 100 TB: append change-shard files per refresh (the
    * changed vertices and their ≤ 2k-bounded incident srcs are known
    * from the graph's delta) and compact on the compaction cadence,
    * trading write amplification for a read-side merge. The refresh
    * CADENCE is owned by the maintainer ([[graft.pipeline.IndexSync]]'s
    * `servingPackDir` refreshes on its compactEvery), so refresh cost is
    * amortized over many absorbed epochs, never paid per event.
    */
  def build(spark: SparkSession, graphDir: String, embeddings: DataFrame,
      outDir: String, nSeeds: Int = 32): Int = {
    import spark.implicits._
    val committed =
      if (fsOf(spark, outDir).exists(
        new org.apache.hadoop.fs.Path(metaDir(outDir))))
        committedEpochs(spark, metaDir(outDir), "serving pack").max
      else -1
    Seq(s"$outDir/adj", s"$outDir/seeds", metaDir(outDir))
      .foreach(clearDirsAbove(spark, _, committed))
    val next = committed + 1
    val e = VectorQueries.nrmFrame(embeddings.select("vec_id", "embedding"))
      .localCheckpoint() // normalized once; feeds adjacency AND seeds
    val n = e.count()
    // the undirected closure — the build-time half of HNSW's
    // bidirectional linking, computed once per graph epoch instead of
    // once per serving call — with the DST vector collocated on the edge
    val ranked = KnnGraphBuild.readGraph(spark, graphDir)
    val adj = ranked
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
      .unionByName(ranked
        .select(col("vec_id").as("src"), col("q_id").as("dst")))
      .distinct()
      .join(e.select(col("vec_id").as("dst"), col("embedding"), col("nrm")),
        "dst")
      .withColumn("bucket", bucketOfId(col("src")))
    if (n == 0)
      // empty corpus: a zero-row partitionBy write leaves only _SUCCESS
      // and the read-back could not infer a schema — land one
      // schema-bearing empty file instead (bucket as a plain column; the
      // isin filter still applies, pruning is moot on nothing)
      adj.coalesce(1).write.mode("overwrite").parquet(adjDir(outDir, next))
    // src-sorted inside each bucket file: at 100 TB parquet's row-group
    // min/max on src prunes WITHIN the bucket too — a frontier id's
    // adjacency list is a point lookup, not a bucket scan
    else adj
      .repartition(Buckets, col("bucket"))
      .sortWithinPartitions("src", "dst")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(adjDir(outDir, next))
    // centroid-spread entry seeds, pinned WITH their vectors: the
    // graph's own IVF quantizer when it has one (free — assignment
    // geometry is already index state), else a fresh bounded kmeans
    val seedIds =
      if (KnnGraphBuild.methodOf(spark, graphDir) == "ivf")
        GraphSearch.centroidSeeds(spark,
          KnnGraphBuild.readCentroids(spark, graphDir), e)
      else GraphSearch.centroidSeeds(spark, e, nSeeds)
    e.join(seedIds.select("vec_id"), Seq("vec_id"), "left_semi")
      .coalesce(1)
      .write.mode("overwrite").parquet(seedsDir(outDir, next))
    val (beam, iters) = GraphSearch.adaptiveWalkParams(n)
    val mp = s"${metaDir(outDir)}/e$next"
    Seq((next, KnnGraphBuild.epochOf(spark, graphDir), n, beam, iters))
      .toDF("epoch", "graph_epoch", "n", "beam", "iters")
      .coalesce(1).write.mode("overwrite").parquet(mp)
    fsOf(spark, mp).create(
      new org.apache.hadoop.fs.Path(mp, CommitMarker), true).close()
    next
  }

  def readMeta(spark: SparkSession, outDir: String): ServeMeta = {
    val e = committedEpochs(spark, metaDir(outDir), "serving pack").max
    val r = spark.read.parquet(s"${metaDir(outDir)}/e$e").head
    ServeMeta(r.getAs[Int]("epoch"), r.getAs[Int]("graph_epoch"),
      r.getAs[Long]("n"), r.getAs[Int]("beam"), r.getAs[Int]("iters"))
  }

  /** The pinned entry seeds (vec_id, embedding, nrm) of the committed
    * pack epoch.
    */
  def readSeeds(spark: SparkSession, outDir: String): DataFrame = {
    val m = readMeta(spark, outDir)
    spark.read.parquet(seedsDir(outDir, m.epoch))
  }

  /** Is the pack current against the live graph state? False after any
    * graph delta/delete committed past the pack's build point — the
    * maintainer's cue to [[build]] again.
    */
  def isFresh(spark: SparkSession, graphDir: String,
      outDir: String): Boolean =
    readMeta(spark, outDir).graphEpoch == KnnGraphBuild.epochOf(spark, graphDir)

  /** Drop pack epochs superseded by the committed one. Returns dirs
    * removed.
    */
  def vacuum(spark: SparkSession, outDir: String): Int = {
    val cur = readMeta(spark, outDir).epoch
    Seq(s"$outDir/adj", s"$outDir/seeds", metaDir(outDir))
      .map { root =>
        val fs = fsOf(spark, root)
        (0 until cur).map(i => new org.apache.hadoop.fs.Path(s"$root/e$i"))
          .count(p => fs.exists(p) && {
            require(fs.delete(p, true), s"could not vacuum $p"); true
          })
      }.sum
  }

  /** Open the committed pack as a warm serving handle: the bucketed
    * adjacency reader's file listing resolves once, the seed vectors
    * (|seeds| rows) pin in memory, and every pinned parameter is in
    * hand — repeated [[Handle.topK]] calls pay ONLY the walk rounds.
    *
    * `pin = true` is the RAM serving tier: the adjacency loads into
    * cluster memory ONCE at open (the HNSW-in-RAM deployment shape —
    * a k·n edge list with collocated vectors is cluster-cacheable far
    * past the corpus sizes that force the disk tier), and rounds scan
    * memory with no file I/O at all. `pin = false` (default) is the
    * disk tier — the DiskANN shape: rounds read the frontier's buckets
    * from the pack, pruned at planning time when the frontier is small
    * enough for pruning to bite (see [[Handle.topK]]).
    */
  def open(spark: SparkSession, outDir: String, pin: Boolean = false): Handle = {
    val m = readMeta(spark, outDir)
    val raw = spark.read.parquet(adjDir(outDir, m.epoch))
    val adj = if (pin) raw.localCheckpoint() else raw
    val seedVecs = readSeeds(spark, outDir).localCheckpoint()
    new Handle(spark, m, adj, seedVecs, pin)
  }

  /** A warm serving session over one committed pack epoch. */
  final class Handle private[queries] (spark: SparkSession, val meta: ServeMeta,
      adj: DataFrame, seedVecs: DataFrame, pinned: Boolean) {

    /** The frontier's out-edges — candidates WITH their collocated
      * vectors — read through the bucket-pruned adjacency. The frontier
      * is COLLECTED once per round (≤ queries × beam (q_id, vec_id)
      * pairs — both factors bounded by contract: the query batch is
      * broadcast-small, beam is O(log n); the probeCells idiom one rung
      * up): one job materializes it, the bucket list derives driver-side
      * ([[bucketOfIdDriver]]) so the partition filter reaches the scan
      * at PLANNING time with no second job, and the collected rows
      * re-enter as a local relation for the broadcast join. One pruned
      * scan per round is the whole round's I/O. Exposed for the pruning
      * spec (numFiles-asserted there; the serving plan hides scan
      * metrics behind the walk's checkpoints).
      */
    private[queries] def prunedAdj(frontier: DataFrame): DataFrame = {
      import spark.implicits._
      val f = frontier.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      if (f.isEmpty)
        adj.limit(0).select(lit(0L).as("q_id"), col("dst").as("vec_id"),
          col("embedding"), col("nrm"))
      else {
        val bs = f.map(p => bucketOfIdDriver(p._2)).distinct.sorted
        val fLocal = f.toSeq.toDF("q_id", "src")
        adj.filter(col("bucket").isin(bs.map(b => b: Any): _*))
          .join(broadcast(fLocal), "src")
          .select(col("q_id"), col("dst").as("vec_id"),
            col("embedding"), col("nrm"))
        // duplicates (one per frontier vertex naming the candidate) ride
        // through scoring and dedup THERE — see topK's score
      }
    }

    /** The lazy (non-collecting) round read: the frontier broadcasts
      * into the adjacency with NO driver materialization — the shape for
      * a frontier that would cover (nearly) every bucket anyway, where a
      * pruning collect would pay a job to discover it prunes nothing,
      * and for the pinned RAM tier, where there is no file I/O to prune.
      */
    private def lazyAdj(frontier: DataFrame): DataFrame =
      broadcast(frontier.select(col("q_id"), col("vec_id").as("src")))
        .join(adj, "src")
        .select(col("q_id"), col("dst").as("vec_id"),
          col("embedding"), col("nrm"))

    /** Beam-search top-`k` — [[GraphSearch.beamTopK]]'s walk (the shared
      * [[GraphSearch.walk]] core, so results are row-identical to the
      * frame-based form under the pack's seeds and parameters), with
      * scoring fed entirely from the collocated vectors and each round's
      * one read bucket-pruned WHEN PRUNING CAN BITE: a frontier of
      * queries × beam ids covers ~every bucket once it exceeds a few
      * multiples of [[Buckets]], so the pruning collect runs only below
      * that bound (a production pack sets Buckets O(corpus partitions),
      * putting realistic query batches under it; the fixture's 16 keeps
      * single-query batches pruned). `beam`/`iters` default to the
      * pack's pinned measured operating point.
      */
    def topK(queries: DataFrame, k: Int, beam: Int = -1,
        iters: Int = -1): DataFrame = {
      val beamN = if (beam > 0) beam else meta.beam
      val itersN = if (iters >= 0) iters else meta.iters
      val q = broadcast(queries
        .select(col("q_id"), col("q_emb"), l2Norm(col("q_emb")).as("q_n")))
      val nQ = queries.count() // bounded by the broadcast-small contract
      val prune = !pinned && nQ * beamN <= 4L * Buckets
      // candidates arrive as (q_id, vec_id, embedding, nrm) — scoring is
      // a broadcast join against the query batch, no read. Duplicate
      // candidate rows (one per frontier vertex naming the neighbor) are
      // SCORED redundantly and deduped after: the cosine is cheap codegen
      // math, and a post-score max-aggregate dedups on three scalars —
      // where a pre-score dropDuplicates would shuffle the collocated
      // vector arrays (measured: the array shuffle dominated the round)
      def score(cand: DataFrame): DataFrame = cand.join(q, "q_id")
        .withColumn("cos_r", round(cosineWithNorms(
          col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
        .groupBy("q_id", "vec_id")
        .agg(max("cos_r").as("cos_r")) // duplicates carry identical cos
        .select("q_id", "vec_id", "cos_r")
      // round 0: every query scores the pinned seed vectors — no reads
      val seedScored = score(q.select("q_id").crossJoin(
        seedVecs.select("vec_id", "embedding", "nrm")))
      GraphSearch.walk(seedScored,
        if (prune) prunedAdj else lazyAdj, score, beamN, itersN, k)
    }
  }

  /** Store-level statistics: pinned parameters plus file counts — one
    * listing, no data read.
    */
  final case class ServeStats(epoch: Int, graphEpoch: Int, n: Long,
      beam: Int, iters: Int, adjFiles: Int, seeds: Long)

  def describe(spark: SparkSession, outDir: String): ServeStats = {
    val m = readMeta(spark, outDir)
    val p = adjDir(outDir, m.epoch)
    val fs = fsOf(spark, p)
    val adjFiles = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath)
      .filter(_.getName.startsWith("bucket="))
      .map(b => fs.listStatus(b).count(_.getPath.getName.endsWith(".parquet")))
      .sum
    ServeStats(m.epoch, m.graphEpoch, m.n, m.beam, m.iters, adjFiles,
      readSeeds(spark, outDir).count())
  }
}
