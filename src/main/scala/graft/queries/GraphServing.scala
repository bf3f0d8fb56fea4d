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
  *     Hive-partitioned by `hash(src) % buckets` and sorted by `src`
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
  * corpus-proportional (the fan-out is pinned PER PACK in [[ServeMeta]];
  * [[Buckets]] = 16 is only the build-time default for the fixture
  * scale — a production pack sizes it O(corpus partitions) so a batch's
  * frontier touches a vanishing fraction, and the src-sorted files let
  * parquet's row-group min/max prune WITHIN a bucket too). The DiskANN
  * collocation costs ~2k vector copies per vertex (undirected degree) —
  * deliberate write/space amplification buying one-read hops, the same
  * trade the paper makes on SSD.
  *
  * The pack is DERIVED state (rebuildable from the graph + corpus at any
  * time); it records the graph epoch it was built from, so staleness is
  * one [[isFresh]] check. Maintenance has TWO verbs, both committing
  * through the [[EpochStore]] protocol, single-writer like every store:
  *
  *   - [[build]] — the full O(n·k) rewrite, also the shard FOLD;
  *   - [[refresh]] — CHANGE-PROPORTIONAL: the graph's own per-epoch
  *     shards name the churned ids ([[KnnGraphBuild.changedSince]]), the
  *     affected src set closes over their old/new neighborhoods (bounded
  *     by churn × degree²), and only those srcs' CURRENT adjacency rows
  *     land as a bucket-partitioned change shard under the next pack
  *     epoch, with a per-epoch src-membership list as the liveness
  *     authority. Reads serve base + shards with a per-src max-epoch
  *     merge (the [[IndexedLayout.readCorpus]] liveness idiom): a src's
  *     rows come from the newest epoch that CLAIMS it — which also
  *     expresses deletion (claimed, zero rows). Rows WRITTEN per refresh
  *     are churn-sized, never corpus-sized; the remaining corpus-touching
  *     reads are scalar-only (the edge list for the neighborhood hops,
  *     one pass for seeds/norms) — the k-fold collocated-vector write
  *     amplification is paid only for churned neighborhoods. Shards fold
  *     back into a full base every `foldEvery` refreshes (amortized on
  *     the maintainer's compaction cadence, [[graft.pipeline.IndexSync]]).
  */
object GraphServing {

  /** DEFAULT src-hash fan-out of the adjacency store. The operative value
    * is pinned PER PACK at build time in [[ServeMeta]] (the
    * pinned-quantizer analog — serving computes the same bucket with the
    * same expression AND the same fan-out the write used, so pruning
    * stays correct across sessions even if this default changes).
    */
  val Buckets = 16

  import EpochStore.{CommitMarker, clearDirsAbove, committedEpochs, fsOf}

  private def metaDir(d: String) = s"$d/meta"
  private def adjDir(d: String, e: Int) = s"$d/adj/e$e"
  private def seedsDir(d: String, e: Int) = s"$d/seeds/e$e"
  private def srcsDir(d: String, e: Int) = s"$d/srcs/e$e"

  private[queries] def bucketOfId(id: Column, buckets: Int): Column =
    pmod(hash(id), lit(buckets))

  /** Driver-side twin of [[bucketOfId]]: Spark's `hash()` over one LONG
    * column is Murmur3 (x86_32) of the value with seed 42 — pinned Spark
    * semantics (partitioned-table layouts depend on `hash()` stability),
    * and pinned HERE by GraphServingSpec asserting driver ≡ column over
    * the whole fixture id set. Lets a round derive its bucket list from
    * the already-collected frontier without a second Spark job.
    */
  private[queries] def bucketOfIdDriver(id: Long, buckets: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(id, 42)
    ((h % buckets) + buckets) % buckets
  }

  /** (pack epoch, graph epoch built from, corpus size, pinned beam,
    * pinned iters, pinned bucket fan-out, base epoch holding the full
    * adjacency — epochs (base, epoch] are change shards).
    */
  final case class ServeMeta(epoch: Int, graphEpoch: Int, n: Long,
      beam: Int, iters: Int, buckets: Int, base: Int)

  /** Build (or fold) the serving pack for the [[KnnGraphBuild]] state
    * at `graphDir` over its corpus `embeddings` — one corpus-sized pass
    * per call, paid at BUILD time so serving never pays it. A new pack
    * epoch lands under fresh dirs and flips live at the meta commit; a
    * crashed build's leftovers roll back on the next verb (the shared
    * [[EpochStore]] discipline). The new epoch is its own BASE: every
    * earlier epoch (full or shard) is superseded. Returns the committed
    * pack epoch. For churn-sized graph advances prefer [[refresh]] —
    * this full form is its fold target and the bootstrap.
    */
  def build(spark: SparkSession, graphDir: String, embeddings: DataFrame,
      outDir: String, nSeeds: Int = 32, buckets: Int = Buckets): Int = {
    val committed =
      if (fsOf(spark, outDir).exists(
        new org.apache.hadoop.fs.Path(metaDir(outDir))))
        committedEpochs(spark, metaDir(outDir), "serving pack").max
      else -1
    Seq(s"$outDir/adj", s"$outDir/seeds", s"$outDir/srcs", metaDir(outDir))
      .foreach(clearDirsAbove(spark, _, committed))
    val next = committed + 1
    val e = VectorQueries.nrmFrame(embeddings.select("vec_id", "embedding"))
      .localCheckpoint() // normalized once; feeds adjacency AND seeds
    val n = e.count()
    // the undirected closure — the build-time half of HNSW's
    // bidirectional linking, computed once per graph epoch instead of
    // once per serving call — with the DST vector collocated on the edge
    val g = KnnGraphBuild.readEdges(spark, graphDir)
    val adj = undirected(g, g)
      .join(e.select(col("vec_id").as("dst"), col("embedding"), col("nrm")),
        "dst")
      .withColumn("bucket", bucketOfId(col("src"), buckets))
    writeAdj(spark, adj, adjDir(outDir, next), buckets, empty = n == 0)
    writeSeeds(spark, graphDir, e, outDir, next, nSeeds)
    val (beam, iters) = GraphSearch.adaptiveWalkParams(n)
    writeMeta(spark, outDir, ServeMeta(next,
      KnnGraphBuild.epochOf(spark, graphDir), n, beam, iters, buckets,
      base = next))
    next
  }

  /** CHANGE-PROPORTIONAL refresh: bring the pack up to the graph's
    * committed epoch by appending one bucket-partitioned change shard
    * instead of rewriting the corpus-sized base (the escape hatch the
    * class scaladoc documents — rows written bounded by churn ×
    * degree², never by n·k).
    *
    * The affected-src derivation is EXACT, in two steps over
    * [[KnnGraphBuild]]'s verbs (delta / deltaIvf / deleteVecs), whose
    * churned ids each epoch's own shards record:
    *
    *   1. a DIRECTED top-k list can change only for a churned id itself,
    *      a delete victim (an old neighbor of a dead id — its list is
    *      rebuilt), or an old vertex that gained a new-id edge (a new
    *      neighbor of an inserted id): `D ⊆ changed ∪ N_old(changed) ∪
    *      N_new(changed)` — a one-hop superset;
    *   2. every changed UNDIRECTED edge therefore has an endpoint in D,
    *      so diffing D's old row set (the pack, bucket-pruned, scalar
    *      columns only) against D's new row set (the edge list) yields
    *      ALL changed pairs — and the affected srcs are exactly those
    *      pairs' endpoints. The shard writes only THEM: rows written ≈
    *      2 × changed-edge count, the true churn, not a degree²-amplified
    *      neighborhood.
    *
    * `N_old` reads the pack itself (bucket-pruned to the ids' own
    * buckets — the bucket list is a ≤ fan-out collect, never a churn
    * collect); `N_new` semi-joins the ids into the graph's edge list (a
    * scalar-only two-column scan — the collocated VECTORS are read only
    * for the affected rows being written). The shard claims every
    * affected src via `srcs/e<K>`; srcs with zero current rows (deleted
    * vertices) are thereby tombstoned.
    *
    * A refresh on a pack that already carries `foldEvery - 1` shards
    * FOLDS instead (delegates to [[build]] under the pack's own pinned
    * fan-out), bounding the read-side merge width. No-op (returns the
    * current epoch) when the pack is already fresh.
    * GraphServingRefreshSpec pins shard-refresh ≡ full rebuild row for
    * row across insert/delete/upsert churn and meters the rows written.
    */
  def refresh(spark: SparkSession, graphDir: String, embeddings: DataFrame,
      outDir: String, nSeeds: Int = 32, foldEvery: Int = 4): Int = {
    val m = readMeta(spark, outDir)
    val g1 = KnnGraphBuild.epochOf(spark, graphDir)
    if (m.graphEpoch == g1) return m.epoch // already fresh
    // a graph epoch BELOW the pack's build point means the graph was
    // fully REBUILT (build() resets the epoch chain) — the pack's
    // lineage is void and there is no delta to reconcile: rebuild.
    // (A rebuild that re-advanced to EXACTLY the pack's epoch number is
    // indistinguishable by epoch alone — [[isFresh]] documents that a
    // full graph rebuild must be paired with a pack [[build]], the same
    // contract as every derived store's bootstrap.)
    if (g1 < m.graphEpoch)
      return build(spark, graphDir, embeddings, outDir, nSeeds, m.buckets)
    if (m.epoch - m.base + 1 >= foldEvery)
      return build(spark, graphDir, embeddings, outDir, nSeeds, m.buckets)
    Seq(s"$outDir/adj", s"$outDir/seeds", s"$outDir/srcs", metaDir(outDir))
      .foreach(clearDirsAbove(spark, _, m.epoch))
    val next = m.epoch + 1
    val e = VectorQueries.nrmFrame(embeddings.select("vec_id", "embedding"))
      .localCheckpoint()
    val n = e.count()
    val edges = KnnGraphBuild.readEdges(spark, graphDir).select("a_id", "b_id")
    val served = servedAdj(spark, outDir, m)
    // old-closure rows for a bounded id set — the pack is the closure AS
    // OF the pack's graph epoch; reads prune to the ids' own buckets
    // (the bucket list is a ≤ fan-out collect) and touch scalar columns
    // only (Parquet never materializes the collocated arrays here)
    def oldRows(x: DataFrame): DataFrame = {
      val bs = x.select(bucketOfId(col("id"), m.buckets).as("b"))
        .distinct().collect().map(_.getInt(0)).sorted // ≤ fan-out values
      if (bs.isEmpty) x.select(col("id").as("src"), col("id").as("dst")).limit(0)
      else served.filter(col("bucket").isin(bs.map(b => b: Any): _*))
        .join(broadcast(x.select(col("id").as("src"))), "src")
        .select("src", "dst")
    }
    // new-closure rows for a bounded src set — two semi-restricted
    // passes over the scalar edge list, mirrored into (src, dst)
    def newRows(x: DataFrame): DataFrame = undirected(
      edges.join(broadcast(x.select(col("id").as("a_id"))), "a_id"),
      edges.join(broadcast(x.select(col("id").as("b_id"))), "b_id"))
    val changed = KnnGraphBuild.changedSince(spark, graphDir, m.graphEpoch)
      .select(col("vec_id").as("id")).localCheckpoint()
    // step 1: the one-hop superset of every src whose DIRECTED list
    // changed (scaladoc dominance argument)
    val d = changed
      .unionByName(oldRows(changed).select(col("dst").as("id")))
      .unionByName(newRows(changed).select(col("dst").as("id")))
      .distinct().localCheckpoint()
    // step 2: every changed undirected edge has an endpoint in D — diff
    // D's old and new row sets and take the changed pairs' endpoints.
    // Both sides are churn × degree bounded scalar frames.
    val oldU = oldRows(d)
    val newU = newRows(d)
    val cp = newU.except(oldU).unionByName(oldU.except(newU))
      .localCheckpoint()
    val affected = cp.select(col("src").as("id"))
      .unionByName(cp.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    // the affected srcs' CURRENT undirected rows, vectors collocated —
    // the only place this refresh touches embedding arrays. Re-derived
    // for `affected` (NOT sliced from newU: a changed pair's dst
    // endpoint need not be in D, but its full row set must still land)
    val und = newRows(affected).localCheckpoint()
    val rows = broadcast(und)
      .join(e.select(col("vec_id").as("dst"), col("embedding"), col("nrm")),
        "dst")
      .withColumn("bucket", bucketOfId(col("src"), m.buckets))
    writeAdj(spark, rows, adjDir(outDir, next), m.buckets,
      empty = und.isEmpty)
    affected.select(col("id").as("src"))
      .coalesce(1).write.mode("overwrite").parquet(srcsDir(outDir, next))
    writeSeeds(spark, graphDir, e, outDir, next, nSeeds)
    val (beam, iters) = GraphSearch.adaptiveWalkParams(n)
    writeMeta(spark, outDir,
      ServeMeta(next, g1, n, beam, iters, m.buckets, m.base))
    next
  }

  /** Undirected closure from directed edge frames: `fwd` supplies
    * (a→src, b→dst), `rev` the mirror — callers pass the same frame
    * twice for the full closure, or two differently-restricted frames
    * (the refresh's affected-src slices).
    */
  private def undirected(fwd: DataFrame, rev: DataFrame): DataFrame =
    fwd.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(rev.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct()

  /** Bucket-partitioned, src-sorted adjacency write. Src-sorted inside
    * each bucket file: at 100 TB parquet's row-group min/max on src
    * prunes WITHIN the bucket too — a frontier id's adjacency list is a
    * point lookup, not a bucket scan. An empty frame lands as one
    * schema-bearing file instead (a zero-row partitionBy write leaves
    * only _SUCCESS and the read-back could not infer a schema; the isin
    * filter still applies, pruning is moot on nothing).
    */
  private def writeAdj(spark: SparkSession, adj: DataFrame, dir: String,
      buckets: Int, empty: Boolean): Unit =
    if (empty)
      adj.coalesce(1).write.mode("overwrite").parquet(dir)
    else adj
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("src", "dst")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(dir)

  /** Centroid-spread entry seeds, pinned WITH their vectors: the graph's
    * own IVF quantizer when it has one (free — assignment geometry is
    * already index state), else a fresh bounded kmeans. Recomputed per
    * epoch (including refreshes) so a shard refresh stays row-identical
    * to a full rebuild — the cost is one scalar assign pass plus a
    * capped-sample kmeans, never an array shuffle.
    */
  private def writeSeeds(spark: SparkSession, graphDir: String, e: DataFrame,
      outDir: String, epoch: Int, nSeeds: Int): Unit = {
    val seedIds =
      if (KnnGraphBuild.methodOf(spark, graphDir) == "ivf")
        GraphSearch.centroidSeeds(spark,
          KnnGraphBuild.readCentroids(spark, graphDir), e)
      else GraphSearch.centroidSeeds(spark, e, nSeeds)
    e.join(seedIds.select("vec_id"), Seq("vec_id"), "left_semi")
      .coalesce(1)
      .write.mode("overwrite").parquet(seedsDir(outDir, epoch))
  }

  private def writeMeta(spark: SparkSession, outDir: String,
      m: ServeMeta): Unit = {
    import spark.implicits._
    val mp = s"${metaDir(outDir)}/e${m.epoch}"
    Seq((m.epoch, m.graphEpoch, m.n, m.beam, m.iters, m.buckets, m.base))
      .toDF("epoch", "graph_epoch", "n", "beam", "iters", "buckets", "base")
      .coalesce(1).write.mode("overwrite").parquet(mp)
    fsOf(spark, mp).create(
      new org.apache.hadoop.fs.Path(mp, CommitMarker), true).close()
  }

  def readMeta(spark: SparkSession, outDir: String): ServeMeta = {
    val e = committedEpochs(spark, metaDir(outDir), "serving pack").max
    val df = spark.read.parquet(s"${metaDir(outDir)}/e$e")
    val r = df.head
    // packs persisted before the fan-out/base were meta state carry
    // neither column — they were written under the then-constant 16 with
    // a full base per epoch; reading them must keep serving correctly
    // (the layout-determining parameter must NEVER come from the code's
    // current default)
    val fields = df.schema.fieldNames.toSet
    ServeMeta(r.getAs[Int]("epoch"), r.getAs[Int]("graph_epoch"),
      r.getAs[Long]("n"), r.getAs[Int]("beam"), r.getAs[Int]("iters"),
      if (fields("buckets")) r.getAs[Int]("buckets") else 16,
      if (fields("base")) r.getAs[Int]("base") else e)
  }

  /** The pinned entry seeds (vec_id, embedding, nrm) of the committed
    * pack epoch.
    */
  def readSeeds(spark: SparkSession, outDir: String): DataFrame = {
    val m = readMeta(spark, outDir)
    spark.read.parquet(seedsDir(outDir, m.epoch))
  }

  /** The committed epoch's served adjacency: the base alone when no
    * shards exist (plan-identical to the pre-shard read), else base +
    * change shards resolved per src — a src's rows come from the newest
    * epoch whose `srcs` list claims it (deleted srcs: claimed, zero
    * rows). The claim map is churn-bounded and BROADCAST, so the merge
    * adds no shuffle to the array-carrying adjacency, and the bucket
    * filter a serving round applies pushes through the union into every
    * epoch dir's scan — shards are bucket-partitioned exactly like the
    * base, so planning-time pruning survives the merge.
    */
  private[queries] def servedAdj(spark: SparkSession, outDir: String,
      m: ServeMeta): DataFrame = {
    if (m.epoch == m.base) spark.read.parquet(adjDir(outDir, m.base))
    else {
      val shardEpochs = (m.base + 1) to m.epoch
      val claims = shardEpochs.map(i =>
          spark.read.parquet(srcsDir(outDir, i)).withColumn("__se", lit(i)))
        .reduce(_ unionByName _)
        .groupBy("src").agg(max("__se").as("__se"))
      (Seq(m.base) ++ shardEpochs).map(i =>
          spark.read.parquet(adjDir(outDir, i)).withColumn("__e", lit(i)))
        .reduce(_ unionByName _)
        .join(broadcast(claims), Seq("src"), "left")
        .filter(col("__e") === coalesce(col("__se"), lit(m.base)))
        .drop("__e", "__se")
    }
  }

  /** Is the pack current against the live graph state? False after any
    * graph delta/delete committed past the pack's build point — the
    * maintainer's cue to [[refresh]]. Epoch-number equality is the
    * check, so a FULL graph rebuild that re-advanced to exactly the
    * pack's recorded epoch is indistinguishable from freshness: a graph
    * [[KnnGraphBuild.build]] must be paired with a pack [[build]] (the
    * bootstrap contract every derived store shares); [[refresh]] guards
    * the detectable half (graph epoch BELOW the pack's) by rebuilding.
    */
  def isFresh(spark: SparkSession, graphDir: String,
      outDir: String): Boolean =
    readMeta(spark, outDir).graphEpoch == KnnGraphBuild.epochOf(spark, graphDir)

  /** Drop pack state superseded by the committed epoch: adjacency and
    * src-claim shards BELOW THE BASE (live shards sit in (base, epoch]
    * and must survive), seeds/meta below the committed epoch. Returns
    * dirs removed.
    */
  def vacuum(spark: SparkSession, outDir: String): Int = {
    val m = readMeta(spark, outDir)
    def drop(root: String, below: Int): Int = {
      val fs = fsOf(spark, root)
      (0 until below).map(i => new org.apache.hadoop.fs.Path(s"$root/e$i"))
        .count(p => fs.exists(p) && {
          require(fs.delete(p, true), s"could not vacuum $p"); true
        })
    }
    drop(s"$outDir/adj", m.base) + drop(s"$outDir/srcs", m.base) +
      drop(s"$outDir/seeds", m.epoch) + drop(metaDir(outDir), m.epoch)
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
    * enough for pruning to bite (see [[Handle.topK]]). Either tier
    * resolves the base+shard merge at open; a shard-refreshed pack and
    * a folded one serve through the same Handle code.
    */
  def open(spark: SparkSession, outDir: String, pin: Boolean = false): Handle = {
    val m = readMeta(spark, outDir)
    val raw = servedAdj(spark, outDir, m)
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
      * ([[bucketOfIdDriver]] at the pack's pinned fan-out) so the
      * partition filter reaches the scan at PLANNING time with no second
      * job, and the collected rows re-enter as a local relation for the
      * broadcast join. One pruned scan per round is the whole round's
      * I/O. Exposed for the pruning spec (numFiles-asserted there; the
      * serving plan hides scan metrics behind the walk's checkpoints).
      */
    private[queries] def prunedAdj(frontier: DataFrame): DataFrame = {
      import spark.implicits._
      val f = frontier.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      if (f.isEmpty)
        adj.limit(0).select(lit(0L).as("q_id"), col("dst").as("vec_id"),
          col("embedding"), col("nrm"))
      else {
        val bs = f.map(p => bucketOfIdDriver(p._2, meta.buckets))
          .distinct.sorted
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
      * multiples of the pack's fan-out, so the pruning collect runs only
      * below that bound (a production pack sets the fan-out O(corpus
      * partitions), putting realistic query batches under it; the
      * fixture's 16 keeps single-query batches pruned). `beam`/`iters`
      * default to the pack's pinned measured operating point.
      */
    def topK(queries: DataFrame, k: Int, beam: Int = -1,
        iters: Int = -1): DataFrame =
      walkTopK(queries, k, beam, iters, None)

    /** METADATA-FILTERED walk — [[topK]] with an allowlist of vec_ids
      * (tenant / lang / date predicates resolved to ids by the caller,
      * the [[VectorQueries]] filtered-ANN contract). Filtered-DiskANN's
      * lesson (Gollapudi et al., WWW 2023) applied: the walk EXPANDS
      * through filtered-out vertices unchanged — they are the graph's
      * connectivity — and the predicate composes at RESULT SELECTION,
      * ranking the walk's full scored set restricted to the allowlist.
      * Post-filtering the k-bounded beam instead would silently
      * under-fill k (the motivating failure); expansion-time filtering
      * would crater recall by disconnecting the graph. The allowlist
      * joins against the walk's bounded scored set with the SCORED side
      * broadcast, so an allowlist of any size composes without shuffling
      * walk state.
      *
      * `beam` widens the walk for SPARSE predicates — the filtered-ANN
      * search-width rule (a filter keeping fraction f of the corpus
      * leaves ~f of the scored set eligible, so holding recall needs
      * ~1/f more scored mass; DiskANN serves filtered queries with a
      * larger search list L for the same reason). Measured on the sf0.001
      * fixture: the pinned beam holds 0.95 recall at f = 1/3 but 0.77 at
      * f = 1/15, where 2× beam restores 0.95 (GraphFilteredWalkSpec
      * asserts the predicate on every row and the ≥ 0.8 floors at both
      * operating points). Cost stays polylog — the widening scales the
      * beam factor, never the corpus.
      */
    def topK(queries: DataFrame, k: Int, allowedIds: DataFrame,
        beam: Int, iters: Int): DataFrame =
      walkTopK(queries, k, beam, iters, Some(allowedIds))

    /** [[topK]] filtered, at the pack's pinned operating point. */
    def topK(queries: DataFrame, k: Int,
        allowedIds: DataFrame): DataFrame =
      walkTopK(queries, k, -1, -1, Some(allowedIds))

    private def walkTopK(queries: DataFrame, k: Int, beam: Int,
        iters: Int, allowedIds: Option[DataFrame]): DataFrame = {
      val beamN = if (beam > 0) beam else meta.beam
      val itersN = if (iters >= 0) iters else meta.iters
      val q = broadcast(queries
        .select(col("q_id"), col("q_emb"), l2Norm(col("q_emb")).as("q_n")))
      val nQ = queries.count() // bounded by the broadcast-small contract
      val prune = !pinned && nQ * beamN <= 4L * meta.buckets
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
      // the allowlist composes on the walk's bounded scored set: the
      // scored side broadcasts (it is queries × beam × degree × rounds),
      // the allowlist streams — any-size predicates, no walk shuffle
      val resultFilter = allowedIds.map(allowed =>
        (scored: DataFrame) => allowed.select("vec_id").distinct()
          .join(broadcast(scored), "vec_id")
          .select("q_id", "vec_id", "cos_r"))
      GraphSearch.walk(seedScored,
        if (prune) prunedAdj else lazyAdj, score, beamN, itersN, k,
        resultFilter)
    }
  }

  /** Store-level statistics: pinned parameters plus file/shard counts —
    * one listing, no data read.
    */
  final case class ServeStats(epoch: Int, graphEpoch: Int, n: Long,
      beam: Int, iters: Int, buckets: Int, base: Int, shards: Int,
      adjFiles: Int, seeds: Long)

  def describe(spark: SparkSession, outDir: String): ServeStats = {
    val m = readMeta(spark, outDir)
    val adjFiles = (m.base to m.epoch).map { e =>
      val p = adjDir(outDir, e)
      val fs = fsOf(spark, p)
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .map(_.getPath)
        .filter(_.getName.startsWith("bucket="))
        .map(b => fs.listStatus(b).count(_.getPath.getName.endsWith(".parquet")))
        .sum
    }.sum
    ServeStats(m.epoch, m.graphEpoch, m.n, m.beam, m.iters, m.buckets,
      m.base, m.epoch - m.base, adjFiles,
      readSeeds(spark, outDir).count())
  }
}
