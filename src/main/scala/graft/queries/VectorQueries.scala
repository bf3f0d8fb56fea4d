package graft.queries

import graft.{Canon, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over embeddings (SURVEY.md §2.B-LLM) — the engine's
  * vector-DB query surface, the capability the reference's downstream
  * (ChromaDB, README.md:156) owns.
  *
  * Scale design: the brute-force top-k broadcasts the (small) query set and
  * streams the corpus — one pass, no shuffle of the corpus, `local topk per
  * partition → global topk` via window on the tiny (queries × corpus-partition
  * winners) set. The IVF variant prunes the corpus to the query's cell
  * (here the `label` column as the coarse quantizer) before scoring —
  * at 100 TB the cell assignment comes from a k-means centroid table and the
  * corpus is partitioned/bucketed by cell, so a query touches 1/N of data.
  */
object VectorQueries {
  import Canon._

  /** Adaptive LSH bucket width: bits = log2(n/64) clamped to [4, 16], so
    * the expected bucket stays ~64 vectors and the per-table self-join cost
    * grows ~linearly with n.
    */
  private[queries] def adaptiveBits(n: Long): Int =
    math.min(16, math.max(4,
      math.ceil(math.log(n / 64.0) / math.log(2)).toInt))

  /** (vec_id, embedding, nrm, sigs) — the materializable signature frame the
    * graph build and its incremental form both start from. The signature
    * function is DETERMINISTIC in (bits, tables), which is what makes the
    * incremental build exact (KnnGraphBuild).
    *
    * Spread BEFORE the projection (the minhashSigs rationale): a small
    * local corpus is one input split, which would run the CPU-bound
    * bits×tables hyperplane projections — and the whole downstream
    * explode/join map side up to the first exchange — on a single core.
    * Guarded by Spread.ifNarrow (r19): at warehouse scale the scan is
    * already many splits, and an unconditional repartition(n) would
    * COALESCE it to n and pay an unneeded full shuffle — the guard passes
    * wide inputs through untouched. Safe for exactness: every
    * signature/cosine is a per-row deterministic expression and cos_r
    * rounds to 6 decimals before any top-k, so partitioning cannot
    * reorder ties.
    */
  private[queries] def sigFrame(e: org.apache.spark.sql.DataFrame,
      bits: Int, tables: Int): org.apache.spark.sql.DataFrame =
    graft.Spread.ifNarrow(e, e.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"),
        lshSignatures(col("embedding"), bits, tables).as("sigs"))

  /** One row per (vec, table): the exact bucket. */
  private[queries] def bucketsOf(sigs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sigs.select(col("vec_id"), posexplode(col("sigs")).as(Seq("tbl", "bucket")))

  /** MULTI-PROBE side: the exact bucket plus every Hamming-1 neighbor —
    * and, above [[Radius2Bits]] signature bits, every Hamming-2 neighbor
    * too. The conditions are symmetric, so probing ONE join side covers
    * every such pair.
    *
    * WHY the radius must grow with bits: a near pair's per-table collision
    * probability at radius r is P(sig distance <= r), and distance is
    * ~Binomial(bits, p_diff) — as adaptiveBits grows with n, the d=0 and
    * d<=1 mass collapses (measured recall on the ×5 ScaleProbe corpus at
    * 8 bits: 0.634 with radius 1, the 0.9 floor needs d<=2). Radius 2 costs
    * a 1+bits+C(bits,2) fan-out, which is why it switches on only when the
    * bit count — not the wall-clock — demands it; at sf0.1 (5 bits) and
    * below the plan is unchanged. The alternative — more OR-ed tables —
    * needs ~1/p^bits of them, exponential in bits (from 0.634, holding 0.9
    * at ×5 needs 14+ tables vs 6).
    */
  private[queries] val Radius2Bits = 7

  private[queries] def probesOf(buckets: org.apache.spark.sql.DataFrame,
      bits: Int): org.apache.spark.sql.DataFrame = {
    val flips1 = (0 until bits).map(i => lit(1L << i))
    val flips2 =
      if (bits < Radius2Bits) Seq.empty
      else for (i <- 0 until bits; j <- i + 1 until bits)
        yield lit((1L << i) | (1L << j))
    val masks = lit(0L) +: (flips1 ++ flips2)
    buckets.select(col("vec_id"), col("tbl"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(m)): _*)).as("bucket"))
  }

  /** Undirected self-join candidates: keep a<b and dedup across
    * tables/probes before scoring, so a pair colliding many ways scores
    * ONCE.
    */
  private[queries] def selfCandidates(buckets: org.apache.spark.sql.DataFrame,
      bits: Int): org.apache.spark.sql.DataFrame =
    probesOf(buckets, bits).as("ba").join(buckets.as("bb"),
        col("ba.tbl") === col("bb.tbl") &&
          col("ba.bucket") === col("bb.bucket") &&
          col("ba.vec_id") < col("bb.vec_id"))
      .select(col("ba.vec_id").as("a_id"), col("bb.vec_id").as("b_id"))
      .distinct()

  /** One codegen cosine per (a_id, b_id) pair, endpoints fetched from the
    * given signature frames (both sides the same frame for a self build).
    * 6-decimal rounding BEFORE any top-k so reruns and incremental merges
    * order ties identically.
    */
  private[queries] def scorePairs(cand: org.apache.spark.sql.DataFrame,
      aSide: org.apache.spark.sql.DataFrame,
      bSide: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cand
      .join(aSide.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("nrm").as("a_n")), "a_id")
      .join(bSide.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("nrm").as("b_n")), "b_id")
      .select(col("a_id"), col("b_id"), round(cosineWithNorms(
        col("a_emb"), col("b_emb"), col("a_n"), col("b_n")), 6).as("cos_r"))

  /** Directed top-k edges from undirected scored pairs: mirror, then the
    * two-phase TopKPerKey operator (bounded heaps; only k rows per
    * (vec, map partition) cross the final shuffle — a window would sort
    * every edge). Returns (a_id, b_id, cos_r) — a_id is the query vertex.
    *
    * The mirror is an EXPLODE of each scored row into its two directions,
    * not a self-union: `scored` is a whole candidate-generation +
    * scoring pipeline, and a union would execute that subtree twice
    * (Catalyst does not CSE across union branches — the plan carried two
    * full Generate→join→distinct→score chains; measured ~2× the query's
    * scoring cost at sf0.1). One pass, same multiset of rows, nothing
    * materialized.
    */
  private[queries] def topKEdges(scored: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val directed = scored.select(explode(array(
        struct(col("a_id"), col("b_id"), col("cos_r")),
        struct(col("b_id").as("a_id"), col("a_id").as("b_id"),
          col("cos_r")))).as("e"))
      .select(col("e.a_id").as("a_id"), col("e.b_id").as("b_id"),
        col("e.cos_r").as("cos_r"))
    graft.plans.TopKPerKey(directed,
      Seq(col("a_id")), Seq(col("cos_r").desc, col("b_id").asc), k)
  }

  /** Edge list (a_id, b_id, cos_r) → the catalog's ranked output shape. */
  private[queries] def rankGraph(edges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    // rank only the k-bounded survivors (n·k rows), never the edge set
    edges.withColumn("rnk", row_number().over(Window.partitionBy("a_id")
        .orderBy(col("cos_r").desc, col("b_id").asc)))
      .select(col("a_id").as("q_id"), col("rnk"),
        col("b_id").as("vec_id"), r4(col("cos_r")).as("cos"))
      .orderBy("q_id", "rnk")

  /** The one copy of the self-build pipeline (bucket self-join → scored
    * pairs → directed top-k), shared by the q_sim_knn_graph catalog query
    * and KnnGraphBuild — a candidate/scoring fix lands in both or neither
    * (the spec pins their equivalence).
    */
  private[queries] def graphEdges(sigs: org.apache.spark.sql.DataFrame,
      bits: Int, k: Int): org.apache.spark.sql.DataFrame = {
    val buckets = bucketsOf(sigs)
    val cand = selfCandidates(buckets, bits)
    topKEdges(scorePairs(cand, sigs, sigs), k)
  }

  /** The q_sim_knn_graph body (also driven by RecallProbe with explicit
    * knobs): directed top-`k` cosine neighbors for EVERY corpus vector via
    * an LSH bucket self-join. No broadcast hint anywhere — both join sides
    * are corpus-sized by definition.
    */
  def knnGraph(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int, tables: Int, bitsOverride: Int = 0,
      nHint: Long = -1L): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val bits =
      if (bitsOverride > 0) bitsOverride
      else adaptiveBits(if (nHint >= 0) nHint else e.count())
    val sigs = sigFrame(e, bits, tables).localCheckpoint()
    rankGraph(graphEdges(sigs, bits, k))
  }

  /** Corpus size at which [[adaptiveBits]] saturates its 16-bit clamp
    * (ceil(log2(n/64)) >= 16 ⟺ n > 64·2^15): beyond it the LSH build has
    * no knob left, so the IVF build takes over. The constant is a
    * RECALL-FIRST decision, measured both ways on the ×5 ScaleProbe
    * corpus (n=10,000, diffuse clusters — best centroid cosine ~0.2):
    *   - COST says switch early: past the Hamming-radius-2 probe onset
    *     (n > 4,096) the LSH build turns superlinear (×5 exponent 1.42,
    *     23.2 s) while default-knob IVF stays bounded (×5 ~0.35, 9.8 s —
    *     but at 0.377 recall@5: nprobe·cellSize candidates are
    *     near-arbitrary when the quantizer carries this little signal);
    *   - RECALL says don't: the LSH build's radius-widening held 0.955 —
    *     hyperplane collisions correlate with cosine directly, the
    *     guarantee mean-centroid cells lack on diffuse data — and the
    *     measured IVF recall/cost frontier (IVF_FRONTIER.json, swept over
    *     nprobe × cells at ×5) prices IVF's route to the same recall:
    *     nprobe=12 at the default n/64 cells reaches 0.981 at 38 s,
    *     ~1.7× the LSH build's cost at this scale. Cheaper-and-equal does
    *     not exist on this corpus, so LSH wins while it has bit headroom.
    * Past the clamp the choice inverts: LSH's buckets grow without bound
    * (no knob at all) while IVF keeps its bounded-candidate shape, so the
    * auto build hands off there — at the frontier's ≥0.9-recall operating
    * point ([[GraphAutoIvfNprobe]]), not the default nprobe. Default-knob
    * recall and the in-situ switched recall are both recorded per run in
    * BENCH_scale (knn_ivf_recall_x5 / knn_auto.insitu).
    */
  private[graft] val GraphAutoIvfThreshold: Long = 64L << 15

  /** The nprobe the AUTO build uses on its IVF side — the measured
    * ≥0.9-recall operating point on the worst-case (diffuse) probe corpus
    * (IVF_FRONTIER.json: 0.981 recall@5 at the default n/64 cells, vs
    * 0.377 at the catalog default nprobe=3). The catalog query keeps
    * nprobe=3: it demonstrates the operator's bounded-candidate shape;
    * the auto build is the path that must HOLD the recall floor when it
    * inherits a corpus too big for LSH.
    */
  private[graft] val GraphAutoIvfNprobe: Int = 12

  /** The crossover the two builds' scaladocs promised, in code: LSH while
    * the adaptive bit width still has headroom, IVF once it saturates.
    * One count decides (from table stats at 100 TB); either branch is the
    * unchanged single-copy pipeline, so the spec can pin this to
    * row-identity with the chosen side. `thresholdOverride` exists for the
    * spec to force the IVF branch at test scale.
    */
  def knnGraphAuto(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int, tables: Int = 6, nprobe: Int = GraphAutoIvfNprobe,
      thresholdOverride: Long = 0L): org.apache.spark.sql.DataFrame = {
    val threshold =
      if (thresholdOverride > 0) thresholdOverride else GraphAutoIvfThreshold
    val n = Tables.embeddings(s, dir).select("vec_id").count()
    if (n > threshold) knnGraphIvf(s, dir, k, nprobe, nHint = n)
    else knnGraph(s, dir, k, tables, nHint = n)
  }

  /** IVF-partitioned k-NN graph — the structure the LSH build's scaladoc
    * names for the far side of the bit clamp, made concrete: train a
    * k-means coarse quantizer ([[graft.functions.VectorIndex]]), assign
    * every vector to its top-`nprobe` cells by cosine, and generate
    * candidate pairs only WITHIN shared cells. Candidates/vector is
    * bounded by nprobe · cell-size regardless of n (cells grow with the
    * corpus), and recall is a direct function of nprobe — the knob LSH
    * lacks once p^bits collapses. The only broadcast is the centroid
    * table (k·dim doubles — index metadata, not a corpus side), so the
    * self-join remains shuffle-partitioned by cell: at 100 TB each cell's
    * pairs are generated where the cell's vectors live, which is exactly
    * how the corpus would be bucketed on disk. Deterministic end to end
    * (seeded k-means init, ties → lowest cell/id).
    */
  def knnGraphIvf(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int, nprobe: Int, nHint: Long = -1L,
      trainCapPerCell: Long = 256L,
      cellsOverride: Int = 0,
      iters: Int = 1): org.apache.spark.sql.DataFrame = {
    import graft.functions.VectorIndex
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val n = if (nHint >= 0) nHint else e.count()
    val cells = if (cellsOverride > 0) cellsOverride else ivfCellCount(n)
    // spread before the checkpoint (the sigFrame rationale): a one-split
    // local corpus would otherwise run every map side — centroid assign,
    // candidate generation, pair scoring — on a single core
    // NO pre-spread here (deliberate asymmetry with sigFrame): nrmFrame is
    // one cheap l2Norm per row — there is no CPU-bound projection for a
    // spread to parallelize — and at local corpus scale a forced
    // defaultParallelism-wide checkpoint turns every downstream IVF stage
    // (train, assign, cell join, scoring) into core-count micro-tasks:
    // measured 2.47 -> 3.39 s REGRESSION in matched subset runs when this
    // carried the sigFrame repartition (r18 midpoint), reverted on that
    // evidence. At warehouse scale the scan is already many splits, so the
    // spread would be a no-op there anyway.
    val sigs = nrmFrame(e).localCheckpoint()
    val centroids = VectorIndex.kmeansCentroids(s,
      // one Lloyd pass by default, like the other IVF/PQ trainers: recall
      // is set by nprobe co-residence, not quantizer polish (measured:
      // iters=1 keeps the graph at 0.97 recall@5 at sf0.001 — same as
      // iters=2 — and drops a full distributed assign+update chain; the
      // ×5 frontier probe sweeps `iters` to re-test that claim at scale)
      trainFrame(sigs, n, cells, trainCapPerCell), cells, iters = iters)
    val assign = ivfAssign(sigs, centroids, nprobe)
    rankGraph(topKEdges(scorePairs(ivfCellCandidates(assign), sigs, sigs), k))
  }

  /** IVF cell count for an n-vector corpus: ~64 vectors per cell, clamped
    * in Long space BEFORE the Int conversion — (n / 64).toInt wraps
    * negative past n ≈ 1.4e11 and would silently fall to 4 giant cells,
    * the opposite of the bounded-candidates contract.
    */
  private[graft] def ivfCellCount(n: Long): Int =
    math.min(1024L, math.max(4L, n / 64)).toInt

  /** (vec_id, embedding, nrm) — the norm-carrying frame every IVF step
    * (train, assign, score) consumes; the IVF analog of [[sigFrame]].
    */
  private[graft] def nrmFrame(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))

  /** Quantizer TRAINING input: the whole frame while it is small, a
    * hash-spread sample of `256·cells` vectors beyond that — the
    * VectorIndex training contract ("the training input must be an
    * explicit sample") made real at the call sites instead of left to
    * prose. Lloyd's cost is then O(sample·iters) independent of n; only
    * the single ASSIGN pass still touches the full corpus. The sample is
    * the same deterministic TakeOrdered-by-xxhash64 spread the seeding
    * uses (per-partition top-k, no full sort), so it cannot collapse onto
    * one id-contiguous shard. 256·cells keeps ≥256 training vectors per
    * centroid (4× the ~64 target cell size); at every driver-tested sf
    * the corpus is under the cap, so this is the identity there.
    */
  private[graft] def trainFrame(sigs: org.apache.spark.sql.DataFrame,
      n: Long, cells: Int, capPerCell: Long = 256L): org.apache.spark.sql.DataFrame = {
    val cap = capPerCell * cells
    if (n <= cap) sigs
    else sigs.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(cap.toInt)
  }

  /** Top-`nprobe` cells per vector by centroid cosine (ties → lowest cell),
    * via the bounded-heap TopKPerKey — one (vec_id, cell) row per
    * assignment. DETERMINISTIC in the centroid table, which is what makes
    * the incremental IVF build exact (KnnGraphBuild.deltaIvf): the
    * quantizer is pinned index state, so re-assigning any vector at any
    * epoch lands in the same cells. Only the centroid table broadcasts.
    */
  private[graft] def ivfAssign(sigs: org.apache.spark.sql.DataFrame,
      centroids: org.apache.spark.sql.DataFrame,
      nprobe: Int): org.apache.spark.sql.DataFrame = {
    val c = centroids.withColumn("cn", l2Norm(col("centroid")))
    graft.plans.TopKPerKey(
      sigs.crossJoin(broadcast(c))
        .withColumn("sim", cosineWithNorms(
          col("embedding"), col("centroid"), col("nrm"), col("cn")))
        .select(col("vec_id"), col("cell"), col("sim")),
      Seq(col("vec_id")), Seq(col("sim").desc, col("cell").asc), nprobe)
  }

  /** Undirected candidates from shared-cell co-residence: a<b, deduped so
    * a pair sharing several probed cells scores ONCE — the IVF analog of
    * [[selfCandidates]]. The join shuffles on the cell key; candidates per
    * vector are bounded by nprobe · cell-size independent of n.
    */
  private[graft] def ivfCellCandidates(assign: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    assign.select(col("vec_id").as("a_id"), col("cell"))
      .join(assign.select(col("vec_id").as("b_id"), col("cell").as("b_cell")),
        col("cell") === col("b_cell") && col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()

  /** Exact k-NN graph (every vector × every vector, window top-k) — the
    * recall oracle for q_sim_knn_graph in KnnGraphSpec and RecallProbe.
    * Quadratic by definition; only ever run at probe/spec scale.
    * `sampleEveryQ > 1` keeps every `sampleEveryQ`-th query vertex
    * (deterministic `q_id % mod == 0`) so the oracle cost is O(n·q) on big
    * probe corpora — the recall estimate is over the sampled vertices only.
    */
  def bruteKnnGraph(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int, sampleEveryQ: Long = 1L): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("nrm", l2Norm(col("embedding")))
    val qAll = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("nrm").as("q_n"))
    val q = if (sampleEveryQ > 1) qAll.filter(col("q_id") % sampleEveryQ === 0)
            else qAll
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    q.join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
  }

  /** DuckDB-side cosine matching VectorFunctions: double-promoted,
    * sequential fold — avoids DuckDB's float-typed list_cosine_similarity.
    */
  private def duckCos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""list_sum(list_transform(range(1, len($x) + 1),
         i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"""
    s"""(CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) = 0 THEN 0.0
       ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) END)"""
  }

  /** Full IVF search (the q_sim_ivf_kmeans body): build the coarse
    * quantizer (deterministic k-means, VectorIndex), assign cells, then
    * top-`k` neighbors within each query's `nprobe` NEAREST cells. Queries
    * are corpus members selected by `qPred` (small by contract — they ride
    * a broadcast). Three refinements over the plain nprobe=1 form, all
    * measured in the IvfConfProbe sweep against the ≥0.9 QualityChecksSpec
    * floor:
    *   - MULTI-PROBE: each further-ranked cell catches boundary-straddling
    *     neighbors for 1/kCells more corpus touched (the fraction shrinks
    *     as kCells grows with corpus size);
    *   - CONFIDENCE FALLBACK: a query whose BEST centroid cosine is under
    *     0.1 is essentially ORTHOGONAL to every centroid — the quantizer
    *     carries no signal for it, so it degrades to an exact scan (the
    *     classic ANN escape hatch; the alternative is silently wrong
    *     neighbors). The floor is a measured constant (IvfConfProbe):
    *     real corpus members score best 0.07–0.35 against the
    *     k-center-seeded MEAN centroids while genuinely orthogonal noise
    *     scores ~0.0, so 0.1 splits the populations. (The floor was 0.5
    *     when seeds were the first k vectors by id: the catalog queries
    *     WERE the seeds, so "affinity" measured seed identity — ~0.85 —
    *     not cluster structure; k-center seeding removed that artifact,
    *     and the floor now means orthogonality, not cluster tightness.)
    * FALLBACK CAP (VERDICT r8 item 6): the escape hatch is per-query, so
    * an adversarially noise-heavy batch would silently degrade the whole
    * run to brute force — at 100 TB that's the difference between reading
    * nprobe/k of the corpus and all of it. Like the Jaccard vocab gate,
    * the cap resolves driver-side in one bounded action (the query side is
    * broadcast-sized by contract) and FAILS LOUDLY above
    * `spark.graft.ivf.maxFallbackFrac` (default 0.25) — the caller chooses
    * between raising the cap knowingly or routing the batch to the exact
    * path deliberately; nothing degrades silently.
    * SPILLED POSTINGS (`assign` > 1): each corpus vector is posted to its
    * top-`assign` cells, so a boundary-straddling pair is reachable from
    * EITHER side's home cell — the complement of query-side multi-probe,
    * at `assign`× posting storage. On this corpus — genuinely diffuse
    * clusters, best centroid cosine 0.07–0.35 — query-side probing alone
    * needs to touch 63–75 % of the corpus for 0.9 recall@3 (IvfConfProbe
    * sweep: 0.767 at nprobe/kCells = 4/8, 0.867 at 5/8), while
    * (kCells=16, nprobe=4, assign=3) reaches 0.933 with a candidate
    * volume bounded by nprobe·assign/kCells ≤ 0.75 BEFORE dedup — and the
    * fraction shrinks as kCells grows with the corpus. Candidates dedup
    * on (q_id, vec_id) before scoring, so a pair sharing several cells
    * scores once. One Lloyd pass from the k-center seeds (IvfConfProbe: a
    * second pass moves the affinity distribution by ≲0.03 and bought no
    * recall in the sweep) — probes + spilled postings + the fallback do
    * the recall work, not quantizer polish.
    */
  /** Confidence floor every IVF search path shares (measured constant —
    * see the ivfTopK scaladoc's fallback discussion): below it a query is
    * essentially orthogonal to every centroid and must degrade to an
    * exact scan rather than return silently-wrong neighbors.
    */
  private[graft] val IvfConfFloor = 0.1

  /** THE one copy of the fallback cap (VERDICT r9 item 7): given per-query
    * best-centroid cosine rows (q_id, best), fail loudly when more than
    * `spark.graft.ivf.maxFallbackFrac` (default 0.25, or `capOverride`) of
    * the batch sits under [[IvfConfFloor]] — at 100 TB an uncapped
    * fallback is the difference between reading nprobe/kCells of the
    * corpus and all of it. Returns the fallback q_ids. Driver-side and
    * bounded: the query side is broadcast-contract small on every caller
    * (ivfTopK and the physical layout's prunedTopK).
    */
  private[graft] def ivfFallbackGuard(s: org.apache.spark.sql.SparkSession,
      qBest: org.apache.spark.sql.DataFrame,
      capOverride: Double = -1.0): Set[Long] = {
    val cap =
      if (capOverride >= 0) capOverride
      else s.conf.get("spark.graft.ivf.maxFallbackFrac", "0.25").toDouble
    val flags = qBest
      .select(col("q_id"), (col("best") < IvfConfFloor).as("fb")).distinct()
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val fallbacks = flags.count(_._2)
    require(flags.isEmpty || fallbacks.toDouble / flags.length <= cap,
      s"IVF confidence fallback would exact-scan $fallbacks of " +
        s"${flags.length} queries (cap $cap): these queries have no cluster " +
        "affinity — raise spark.graft.ivf.maxFallbackFrac knowingly or " +
        "route the batch to the exact top-k path instead")
    flags.filter(_._2).map(_._1).toSet
  }

  private[queries] def ivfTopK(s: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame,
      qPred: org.apache.spark.sql.Column, k: Int, nprobe: Int,
      kCells: Int = 8,
      maxFallbackFrac: Double = -1.0,
      iters: Int = 1,
      assign: Int = 1): org.apache.spark.sql.DataFrame = {
    import graft.functions.VectorIndex
    val ConfFloor = IvfConfFloor
    val sigs = nrmFrame(e)
    val centroids = VectorIndex.kmeansCentroids(s,
      trainFrame(sigs, sigs.count(), kCells), k = kCells, iters = iters)
    val cells = ivfAssign(sigs, centroids, assign).select("vec_id", "cell")
    // materialize the query side once: it is broadcast-contract small, and
    // both the driver-side cap check below AND the final scoring join
    // consume it — unmaterialized, each would re-run the corpus filter scan
    val qSide = sigs.filter(qPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_n"))
      .localCheckpoint()
    val qScored = qSide
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosineSimilarity(
        col("q_emb").cast("array<double>"), col("centroid")))
      .withColumn("best", max(col("csim")).over(Window.partitionBy("q_id")))
    ivfFallbackGuard(s, qScored.select("q_id", "best"), maxFallbackFrac)
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("csim").desc, col("cell").asc)
    val q = qScored
      .withColumn("crnk", row_number().over(wProbe))
      .filter(col("crnk") <= nprobe || col("best") < ConfFloor)
      .select("q_id", "q_emb", "q_n", "cell")
    // candidate ids first, deduped (spilled postings make (q, vec) pairs
    // reachable through several shared cells); embeddings fetched after,
    // so each pair is scored exactly once
    val cand = broadcast(q.select("q_id", "cell"))
      .join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
      .distinct()
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    cand
      .join(sigs, "vec_id")
      .join(broadcast(q.select("q_id", "q_emb", "q_n").distinct()), "q_id")
      .withColumn("cos_r", round(
        cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
      .orderBy("q_id", "rnk")
  }

  /** The hybrid RRF oracle SQL — shared verbatim by q_hybrid_rrf (scan
    * form) and q_hybrid_rrf_idx (persisted-index form): identical answers
    * from both serving shapes IS the indexed row's claim.
    */
  private val hybridRrfOracle = s"""WITH tok AS (
                SELECT doc_id, unnest(list_distinct(${TextQueries.duckToks})) AS token
                FROM documents),
              n AS (SELECT count(*) AS n_docs FROM documents),
              idf AS (
                SELECT token,
                       CAST(round(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df), 6)
                            AS DECIMAL(18,6)) AS idf
                FROM (SELECT token, count(*) AS df FROM tok GROUP BY token)
                WHERE df * 2 <= (SELECT n_docs FROM n)),
              lex0 AS (
                SELECT q.q_id, t.doc_id, sum(i.idf) AS lex
                FROM (SELECT doc_id AS q_id, token FROM tok WHERE doc_id < 3) q
                JOIN tok t USING (token)
                JOIN idf i USING (token)
                WHERE t.doc_id <> q.q_id
                GROUP BY q.q_id, t.doc_id),
              lex AS (
                SELECT q_id, doc_id, lrank FROM (
                  SELECT q_id, doc_id, row_number() OVER (
                    PARTITION BY q_id ORDER BY lex DESC, doc_id ASC) AS lrank
                  FROM lex0)
                WHERE lrank <= 10),
              vec0 AS (
                SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 3),
              vec AS (
                SELECT q_id, doc_id, vrank FROM (
                  SELECT q_id, doc_id, row_number() OVER (
                    PARTITION BY q_id ORDER BY cos_r DESC, doc_id ASC) AS vrank
                  FROM vec0)
                WHERE vrank <= 10),
              fused AS (
                SELECT q_id, doc_id,
                       round(coalesce(CAST(1.0 AS DOUBLE) / (60 + lrank), 0) +
                             coalesce(CAST(1.0 AS DOUBLE) / (60 + vrank), 0), 6) AS rrf
                FROM lex FULL JOIN vec USING (q_id, doc_id))
              SELECT q_id, rnk, doc_id, rrf FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q_id ORDER BY rrf DESC, doc_id ASC) AS rnk
                FROM fused)
              WHERE rnk <= 5 ORDER BY q_id, rnk"""

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_sim_pairs",
      (s, dir) => {
        // Pairwise cosine for given id pairs (Q-d3); norms computed pre-join.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
          col("nrm").as("a_n")).filter(col("a_id") < 10)
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
          col("nrm").as("b_n")).filter(col("b_id").between(10, 19))
        a.join(b, col("a_id") + 10 === col("b_id"))
          .select(col("a_id"), col("b_id"),
            r4(cosineWithNorms(col("a_emb"), col("b_emb"), col("a_n"), col("b_n")))
              .as("cos"))
          .orderBy("a_id")
      },
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              round(${duckCos("a.embedding", "b.embedding")}, 4) AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id + 10 = b.vec_id
              WHERE a.vec_id < 10 AND b.vec_id BETWEEN 10 AND 19
              ORDER BY a_id""")),

    GQuery(
      "q_dedup_embcos",
      (s, dir) => {
        // Embedding near-dup pairs, blocked by label (same-cluster only).
        // Norms are a narrow pre-join projection: scoring each candidate
        // pair costs one 64-d dot product instead of three.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val a = e.toDF("a_id", "a_emb", "label", "a_n")
        val b = e.toDF("b_id", "b_emb", "b_label", "b_n")
        a.join(b, col("label") === col("b_label") && col("a_id") < col("b_id"))
          .withColumn("cos",
            cosineWithNorms(col("a_emb"), col("b_emb"), col("a_n"), col("b_n")))
          .filter(col("cos") >= 0.4)
          .select(col("a_id"), col("b_id"), col("label"), r4(col("cos")).as("cos"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
              round(${duckCos("a.embedding", "b.embedding")}, 4) AS cos
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE ${duckCos("a.embedding", "b.embedding")} >= 0.4
              ORDER BY a_id, b_id""")),

    GQuery(
      "q_sim_topk",
      (s, dir) => {
        // Brute-force top-5 cosine neighbors for query vectors vec_id < 10:
        // broadcast the query side, one streaming pass over the corpus.
        // Ranking key is round(cos, 6) then vec_id so float noise can't
        // reorder near-ties across engines.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n")))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        q.join(e, col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      Some(s"""WITH scored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 10),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk FROM scored)
              SELECT q_id, rnk, vec_id, round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""")),

    GQuery(
      "q_sim_topk_filtered",
      (s, dir) => {
        // FILTERED vector search — the vector-DB staple the pure-ANN rows
        // don't cover: top-k restricted to vectors whose METADATA matches
        // a predicate from another table (here: docs with lang = 'en',
        // joined on the documents↔embeddings id alignment). The filter
        // composes BEFORE ranking (true filtered-ANN semantics: the k
        // results all satisfy the predicate — post-filtering a plain
        // top-k would return fewer), and it rides the corpus scan as a
        // semi-join, so the broadcast-query map-only pass shape of
        // q_sim_topk is preserved; on the physical layout the same
        // predicate composes with readCorpus exactly like the tombstone
        // liveness join.
        val allowed = Tables.documents(s, dir)
          .filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val corpus = e.join(allowed, Seq("vec_id"), "left_semi")
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n")))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        q.join(corpus, col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      Some(s"""WITH scored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 10
                  AND c.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk FROM scored)
              SELECT q_id, rnk, vec_id, round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""")),

    GQuery(
      "q_sim_knn_class",
      (s, dir) => {
        // k-NN CLASSIFIER (round 10): predict each query vector's label by
        // majority vote over its 10 nearest neighbors — the prediction
        // face of the similarity surface (dedup/search retrieve rows;
        // this one turns retrieval into a decision). Same broadcast-query
        // one-pass corpus scan as q_sim_topk; the vote is a (q_id, label)
        // count over the k-bounded survivors (20·10 rows) followed by a
        // 1-row-per-query argmax window — nothing after the scan touches
        // corpus-scale data, so the plan scales exactly like top-k.
        // Deterministic end to end: rank ties break on vec_id, vote ties
        // on lowest label.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(
          e.filter(col("vec_id") < 20).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n")))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        val wVote = Window.partitionBy("q_id")
          .orderBy(col("votes").desc, col("label").asc)
        q.join(e, col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .groupBy("q_id", "label")
          .agg(count(lit(1)).as("votes"))
          .withColumn("rn", row_number().over(wVote))
          .filter(col("rn") === 1)
          .select(col("q_id"), col("label").as("pred_label"), col("votes"))
          .orderBy("q_id")
      },
      Some(s"""WITH scored AS (
                SELECT q.vec_id AS q_id, c.vec_id, c.label,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 20),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk FROM scored),
              votes AS (SELECT q_id, label, count(*) AS votes
                FROM ranked WHERE rnk <= 10 GROUP BY 1, 2),
              pick AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY votes DESC, label ASC) AS rn FROM votes)
              SELECT q_id, label AS pred_label, votes
              FROM pick WHERE rn = 1 ORDER BY q_id""")),

    GQuery(
      "q_sim_topk_ivf",
      (s, dir) => {
        // IVF-style pruned search: only the query's cell (label) is scored.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("label").as("q_cell"), col("nrm").as("q_n")))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        q.join(e, col("q_cell") === col("label") && col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      Some(s"""WITH scored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN embeddings c
                  ON q.label = c.label AND q.vec_id <> c.vec_id
                WHERE q.vec_id < 10),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk FROM scored)
              SELECT q_id, rnk, vec_id, round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""")),

    GQuery(
      "q_sim_range",
      (s, dir) => {
        // RANGE search (FAISS range_search): every neighbor within a
        // similarity radius, not a fixed k — the vector-DB query shape for
        // "all near-duplicates of X" where the neighbor count is unknown
        // a priori. Same scale shape as the brute top-k (broadcast query
        // side, ONE streaming corpus pass) but with no per-query ranking
        // state at all: the radius predicate filters inside the scan
        // pass, output size is bounded by selectivity, and no window/sort
        // touches corpus-sized data — at 100 TB this is a map-only job
        // plus the output sort. Raw-cosine threshold (not the rounded
        // value), matching q_dedup_embcos's boundary discipline.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n")))
        q.join(e, col("q_id") =!= col("vec_id"))
          .withColumn("c", cosineWithNorms(
            col("q_emb"), col("embedding"), col("q_n"), col("nrm")))
          .filter(col("c") >= 0.3)
          .select(col("q_id"), col("vec_id"), r4(col("c")).as("cos"))
          .orderBy("q_id", "vec_id")
      },
      Some(s"""SELECT q.vec_id AS q_id, c.vec_id,
              round(${duckCos("q.embedding", "c.embedding")}, 4) AS cos
              FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 10
                AND ${duckCos("q.embedding", "c.embedding")} >= 0.3
              ORDER BY q_id, c.vec_id""")),

    GQuery(
      "q_sim_topk_lsh",
      (s, dir) => {
        // Multi-table hyperplane LSH (rows-only check: the md5-derived
        // planes are deterministic but the SQL expansion is impractical as
        // an oracle; recall vs the exact q_sim_topk is asserted in
        // QualityChecksSpec). A single 4-bit table caught only ~10% of true
        // neighbors; OR-ing L independent tables lifts per-neighbor
        // collision from p to 1-(1-p)^L while each (tbl, bucket) join stays
        // bucket-bounded — candidates are unioned across tables and deduped
        // on bare (q_id, vec_id) BEFORE scoring, so a pair colliding in
        // several tables is scored once. L=16: measured per-table collision
        // p≈0.15 on this corpus gives recall@5 1-(1-p)^8≈0.72 at L=8 and
        // ≈0.92+ at L=16 (the ≥0.9 floor in QualityChecksSpec), for ~1.3×
        // the candidate volume. Signatures are materialized once
        // (localCheckpoint) — 16 tables × 4 interpreted HOF bits would
        // otherwise recompute on both sides of the self-join.
        val sigs = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"),
            l2Norm(col("embedding")).as("nrm"),
            lshSignatures(col("embedding"), bits = 4, tables = 16).as("sigs"))
          .localCheckpoint()
        val buckets = sigs.select(
          col("vec_id"), posexplode(col("sigs")).as(Seq("tbl", "bucket")))
        // query side = |queries|·L rows by construction — broadcast it so
        // the corpus bucket stream is probed in place, never shuffled
        val cand = broadcast(
            buckets.filter(col("vec_id") < 10).toDF("q_id", "tbl", "bucket"))
          .join(buckets, Seq("tbl", "bucket"))
          .filter(col("q_id") =!= col("vec_id"))
          .select("q_id", "vec_id")
          .distinct()
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        cand
          .join(sigs.select(col("vec_id"), col("embedding"), col("nrm")), "vec_id")
          .join(broadcast(sigs.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n"))), "q_id")
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      None),

    GQuery(
      "q_sim_ivf_kmeans",
      (s, dir) =>
        // see ivfTopK for the full design (multi-probe, confidence
        // fallback, and the loud fallback-fraction cap). Rows-only check:
        // parallel float averaging in the centroid update is not
        // bit-reproducible in SQL; recall floor in QualityChecksSpec.
        // (kCells=16, nprobe=4, assign=3): this corpus's clusters are
        // DIFFUSE relative to any coarse quantizer (IvfConfProbe: best
        // centroid cosine 0.07-0.35), so the floor needs BOTH query-side
        // probes and spilled postings — the sweep measured 0.60 at the old
        // (8, 2, 1), 0.767 at (8, 4, 1), 0.933 here. The touched fraction
        // nprobe·assign/kCells is the tuning dial at 100 TB, where kCells
        // grows with the corpus and tighter clusters push it back down.
        ivfTopK(s, Tables.embeddings(s, dir).select("vec_id", "embedding"),
          col("vec_id") < 10, k = 3, nprobe = 4, kCells = 16, assign = 3),
      None),

    GQuery(
      "q_sim_topk_pq",
      (s, dir) => {
        // Product-quantization ANN (VectorIndex.pqCodebooks), the standard
        // two-stage shape: (1) ADC SHORTLIST — the corpus is compressed to
        // m=8 codes per unit-normalized vector and scanned in the
        // compressed domain: per query one m·k lookup table of subspace
        // dots (q×m×k = 1280 rows, broadcast), a vector's estimated cosine
        // is the sum of its m table hits, and the top R=40 estimates
        // survive; (2) EXACT RE-RANK — full-vector cosine touches only the
        // R shortlisted rows per query. At 100 TB stage 1 reads m bytes per
        // vector instead of 4·dim and stage 2 fetches R·q vectors — the
        // compressed scan does the winnowing, exact math never sees the
        // corpus. ADC alone cannot rank this corpus's near-uniform cosine
        // margins (recall@5 ≈ 0.24); with the re-rank the list is exact
        // wherever the shortlist covers the true neighbors (recall floor
        // asserted in QualityChecksSpec). R=320: the shortlist is the
        // recall lever (R=40 measured 0.58 recall@5 at sf0.1, R=160 0.84;
        // the ≥0.9 floor needs the deeper list) and its cost is only q·R
        // exact re-rank rows — the compressed-domain scan, which dominates
        // at scale, is untouched by R. Rows-only: float k-means + PQ
        // distortion admit no SQL oracle.
        // One Lloyd pass suffices here: the deep shortlist absorbs codebook
        // distortion (recall identical to iters=2 at both sf0.001 and
        // sf0.1 per RecallProbe) and every extra pass is a full
        // assign+update job chain.
        // TRAINING IS DRIVER-SIDE over the budget-bounded sample
        // (pqCodebooksDriver): codebook state is k·dim-scale wherever it
        // lives, and the 100 TB contract already says the training input is
        // an explicit sample — so Lloyd runs in memory on the collected
        // sample instead of paying a distributed broadcast+3-shuffle+collect
        // chain per pass (measured 2.4 s of the query's 4.5 s steady-state
        // at sf0.1, on 16k tiny rows — pure fixed job overhead). That also
        // removes the need to checkpoint the subvector frame at all: its
        // remaining consumers (encode, query LUT) are both inside the one
        // final job, and the corpus-side scan parallelizes off the file
        // splits the way every other catalog scan does.
        import graft.functions.VectorIndex
        val m = 8; val dim = 64; val kcb = 16; val shortlist = 320
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        // spread the one-split local scan before the normalize/encode/ADC
        // chain — CAPPED at max(8, cores/4) (r18: full width measured
        // 1.18-1.48 s vs 0.85-1.01 s capped at sf0.1 — the 16k-row
        // subvector frame turns into core-count micro-tasks at full
        // width, the knnGraphIvf lesson). A vector's m sub-rows stay
        // contiguous in one partition, so the per-(q, vec) ADC partial
        // sums combine the same 8 addends in the same order — bit-stable
        val unit = graft.Spread.ifNarrow(e,
            math.max(8, s.sparkContext.defaultParallelism / 4))
          .withColumn("n", l2Norm(col("embedding")))
          .select(col("vec_id"),
            when(col("n") === 0, col("embedding").cast("array<double>"))
              .otherwise(transform(col("embedding"),
                x => x.cast("double") / col("n"))).as("embedding"))
        val sv = VectorIndex.subvectors(unit, m, dim)
        // TRAINING SAMPLE CAP: pqCodebooksDriver REJECTS inputs over the
        // driver budget (maxRows = 2^24/subDim rows ⟺ ~262k vectors at
        // m=8), so feeding it the raw corpus would turn the budget guard
        // into a hard crash past that size. Cap the training input to
        // 2^17 complete vectors via the same deterministic hash spread
        // trainFrame uses — a vector's m subrows share its hash, so the
        // m-aligned limit takes whole vectors; every driver-tested sf is
        // far below the cap (identity there), and 128k vectors is 512×
        // the 256-per-centroid FAISS guideline at kcb=16.
        val trainVecs = 1 << 17
        val svTrain = sv
          .orderBy(xxhash64(col("vec_id")), col("vec_id"), col("sub"))
          .limit(trainVecs * m)
        val books = VectorIndex.pqCodebooksDriver(
          s, svTrain, m, kcb, iters = 1, subDim = dim / m)
        val codes = VectorIndex.pqEncode(sv, books)
        val lut = sv.filter(col("vec_id") < 10)
          .withColumnRenamed("vec_id", "q_id")
          .join(broadcast(books), "sub")
          .select(col("q_id"), col("sub"), col("cell"),
            aggregate(zip_with(col("subvec"), col("centroid"), (x, y) => x * y),
              lit(0.0d), (acc, v) => acc + v).as("pdot"))
        val wAdc = Window.partitionBy("q_id")
          .orderBy(col("est_cos").desc, col("vec_id").asc)
        // codes and lut share the sv lineage — qualify the join through
        // aliases or `sub === sub` resolves to one attribute (a
        // trivially-true predicate, i.e. a silent cross join on sub)
        val short = codes.as("c").join(broadcast(lut.as("l")),
            col("c.sub") === col("l.sub") && col("c.code") === col("l.cell"))
          .filter(col("q_id") =!= col("vec_id"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("pdot")).as("est_cos"))
          .withColumn("adc_rnk", row_number().over(wAdc))
          .filter(col("adc_rnk") <= shortlist)
          .select("q_id", "vec_id")
        val withNorm = e.withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(withNorm.filter(col("vec_id") < 10).select(
          col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_n")))
        val wExact = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        short
          .join(withNorm, "vec_id")
          .join(q, "q_id")
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("rnk", row_number().over(wExact))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"), r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      None),

    GQuery(
      "q_sim_knn_graph",
      (s, dir) => {
        // Corpus-vs-corpus top-k neighbors — the k-NN GRAPH build (the ANN
        // shape behind SemDeDup/embedding near-dup at 100 TB, SURVEY
        // §2.B-LLM "scale path = block-matrix or LSH partitioning"). Every
        // vector is a query, so the broadcast-query-side idiom of the
        // other ANN entries breaks BY CONSTRUCTION: there is no small side.
        // Shape instead:
        //   sigs (one fused HyperplaneSigs pass, materialized once)
        //     → (tbl, bucket) SELF-join, shuffled on the bucket key — no
        //       broadcast anywhere (KnnGraphSpec plan-asserts no hint)
        //     → undirected candidate dedup (a<b) so a pair colliding in
        //       several tables scores ONCE
        //     → two shuffle joins fetch the endpoint vectors; one codegen
        //       cosine per pair; mirror to directed edges
        //     → per-vector top-k through the two-phase TopKPerKey operator
        //       (bounded heaps; only k rows per (vec, map partition)
        //       cross the final shuffle — a window would sort every edge).
        // ADAPTIVE BUCKET WIDTH: bits = log2(n/64) clamped to [4, 16], so
        // the expected bucket stays ~64 vectors and the per-table self-join
        // cost Σ|bucket|² grows ~linearly with n instead of quadratically —
        // the knob a fixed-bits table lacks. Collision probability per
        // table falls as bits grow (p1^bits), which is what the Hamming-1
        // multi-probe inside knnGraph counteracts; L=6 OR-ed tables then
        // hold recall@5 above the 0.9 floor with margin (measured via
        // graft.RecallProbe at sf0.1: 0.942 at L=6 vs 0.976 at L=8 —
        // L=6 trades 0.034 recall for 25% fewer candidate pairs, the term
        // that sets the scale exponent; the rejected alternative, one
        // extra bit at L=8, measured 0.916 — too thin a floor margin for
        // a comparable candidate cut. Without the probes 6 fixed bits
        // measured 0.61). KnnGraphSpec asserts the
        // floor vs the in-spec brute-force graph and that the plan carries
        // no broadcast hint. The count() sizing the index is ONE
        // driver-side long per run — at 100 TB it comes from table stats.
        // SCALE HONESTY (BENCH_scale's knn_recall_x5 + exponent fields):
        // holding a CONSTANT recall floor while n grows is what LSH
        // fundamentally charges n^(1+ρ) for — as adaptiveBits rises past
        // Radius2Bits the probe radius widens to Hamming-2 (probesOf),
        // which is what keeps recall at 0.955 on the ×5 corpus where
        // radius 1 had decayed to 0.634; the measured exponent (1.42 at
        // ×5) is the price of that floor, not an accident — and a price
        // worth paying: the default-knob IVF build is 3× cheaper there
        // but held only 0.377 recall, and driving IVF to the same floor
        // costs ~1.7× LSH (nprobe=12: 0.981 at 38 s — IVF_FRONTIER.json;
        // GraphAutoIvfThreshold's scaladoc has the full two-sided
        // measurement). The crossover is
        // CODE, not prose: knnGraphAuto hands off to IVF at the threshold
        // (bit-clamp saturation — where LSH has no knob left), with both
        // branches pinned row-identical to the chosen side's build in
        // KnnGraphAutoSpec. At every testable sf this resolves to the LSH
        // branch, so the catalog row is unchanged below the threshold by
        // construction.
        knnGraphAuto(s, dir, k = 5, tables = 6, nprobe = 3)
      },
      None),

    GQuery(
      "q_sim_knn_graph_ivf",
      (s, dir) => {
        // The IVF-partitioned graph build (see knnGraphIvf's scaladoc) —
        // the constant-candidates-per-vector structure that takes over
        // from LSH once adaptive bits hit the clamp. Rows-only; recall
        // floor vs the brute-force graph asserted in KnnGraphIvfSpec.
        knnGraphIvf(s, dir, k = 5, nprobe = 3)
      },
      None),

    GQuery(
      "q_sim_topk_graph",
      (s, dir) => {
        // GRAPH-TRAVERSAL ANN search (GraphSearch.beamTopK): top-5 by
        // greedy beam search over the k-NN graph — the HNSW/DiskANN-family
        // serving regime beside brute (q_sim_topk) and IVF
        // (q_sim_topk_ivf): per-query cost is beam × degree × iters
        // candidate scorings with (beam, iters) growing O(log n) to hold
        // the recall floor (adaptiveWalkParams — measured, not assumed),
        // scores computed once per (query, vertex). The row builds the graph via
        // the shared LSH pipeline and then walks it; in production the
        // graph is the PERSISTED, IndexSync-maintained KnnGraphBuild
        // state and only the walk runs (GraphSearchSpec's disk-serving
        // form). Rows-only: approximate by construction; recall floor
        // 0.85 (measured 0.990 at sf0.001, seeds-only 0.050) asserted in
        // GraphSearchSpec.
        val g = knnGraph(s, dir, k = 5, tables = 6).localCheckpoint()
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        GraphSearch.beamTopK(s, g, e, q, k = 5)
      },
      None,
      // correctness row only: ~60 % of its time is the inline LSH graph
      // build, which q_sim_knn_graph already prices — the walk itself is
      // priced by graphsearch_queries_per_s (warm GraphServing handle)
      // and the graph_walk_serve scale probe, so timing this row would
      // double-charge the catalog total for a fixture build
      bench = false),

    GQuery(
      "q_sim_topk_graph_idx",
      (s, dir) => {
        // The INDEX-REGIME form of the row above: the same walk served
        // from the persisted GraphServing pack (bucketed adjacency with
        // collocated vectors, pinned seeds and walk parameters) — the
        // swap-scan-for-index demonstration q_rank_bm25_idx /
        // q_hybrid_rrf_idx make for the lexical and hybrid paths, here
        // for the third ANN regime. GraphServingSpec pins the pack walk
        // row-identical to the frame-based walk under the same pinned
        // state; this row keeps the serve-from-disk path on the
        // correctness surface every round. Rows-only (approximate by
        // construction, like every walk row); bench=false — the inline
        // graph+pack build is fixture state the graph rows already
        // price, and the walk itself is priced by
        // graphsearch_queries_per_s / graph_walk_serve.
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
          .localCheckpoint()
        val gd = java.nio.file.Files
          .createTempDirectory("graft_gsidx_graph").toString
        val pd = java.nio.file.Files
          .createTempDirectory("graft_gsidx_pack").toString
        try {
          KnnGraphBuild.build(s, e, gd, k = 5, tables = 6)
          GraphServing.build(s, gd, e, pd)
          val q = e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
          GraphServing.open(s, pd).topK(q, k = 5)
            .localCheckpoint() // pin the bounded result off the temp dirs
        } finally Seq(gd, pd).foreach(d => org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(d)))
      },
      None,
      bench = false),

    GQuery(
      "q_sim_topk_graph_filtered",
      (s, dir) => {
        // METADATA-FILTERED walk serving (filtered-DiskANN, Gollapudi et
        // al. WWW'23): the allowlist (here: a lang predicate resolved to
        // ids on the documents↔embeddings alignment, the
        // q_sim_topk_filtered contract) composes at RESULT SELECTION
        // over the walk's scored set — expansion keeps traversing
        // filtered-out vertices, so a tenant/lang/date filter neither
        // under-fills k (post-filterings failure) nor craters recall
        // (expansion-filtering's). Rows-only like every walk row;
        // GraphFilteredWalkSpec pins predicate + recall floors.
        // bench=false: inline fixture state, the walk itself is priced
        // by graph_walk_serve.
        val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
          .localCheckpoint()
        val gd = java.nio.file.Files
          .createTempDirectory("graft_gsflt_graph").toString
        val pd = java.nio.file.Files
          .createTempDirectory("graft_gsflt_pack").toString
        try {
          KnnGraphBuild.build(s, e, gd, k = 5, tables = 6)
          GraphServing.build(s, gd, e, pd)
          val allowed = Tables.documents(s, dir)
            .filter(col("lang") === "en")
            .select(col("doc_id").as("vec_id"))
          val q = e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
          GraphServing.open(s, pd).topK(q, k = 5, allowedIds = allowed)
            .localCheckpoint() // pin the bounded result off the temp dirs
        } finally Seq(gd, pd).foreach(d => org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(d)))
      },
      None,
      bench = false),

    GQuery(
      "q_sim_mmr",
      (s, dir) => {
        // MMR DIVERSITY RE-RANK (Carbonell & Goldstein '98): the re-rank
        // stage a production retrieval stack runs after ANN — top-5
        // selected from a 30-deep brute shortlist by λ·relevance −
        // (1−λ)·max-similarity-to-already-selected (λ = 0.7), trading
        // redundancy against relevance. The shortlist is the q_sim_topk
        // broadcast scan (corpus touched once, map-only); the greedy
        // selection runs per query group on the 30-row shortlist
        // (GraphSearch.mmrRerank — the typed last-rung operator, group
        // count = |queries|). Rows-only: deterministic (round-6 + vec_id
        // ties) and pinned EXACTLY against an independent recompute plus
        // hand-computed diversity cases in MmrSpec, but the iterative
        // set-valued selection has no SQL twin.
        // SCALE SHAPE (the GraphServing score-on-scalars discipline): the
        // corpus-sized scan computes cos and immediately projects to
        // (q_id, vec_id, cos_r) SCALARS, so the rank window's exchange
        // never shuffles the 64-float arrays; the embeddings needed for
        // the redundancy term join back only for the ≤ 30-per-query
        // survivors (broadcast — the corpus streams map-side).
        // PlanQualitySpec asserts no pre-rank exchange carries the array.
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n")))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        val short = q.join(e, col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .select("q_id", "vec_id", "cos_r") // scalars into the window
          .withColumn("srnk", row_number().over(w))
          .filter(col("srnk") <= 30)
          .select("q_id", "vec_id", "cos_r")
        val shortlist = broadcast(short)
          .join(e.select("vec_id", "embedding"), "vec_id")
          .select("q_id", "vec_id", "cos_r", "embedding")
        GraphSearch.mmrRerank(s, shortlist, k = 5)
      },
      None),

    GQuery(
      "q_emb_quant",
      (s, dir) => {
        // Int8 scalar quantization — vector-store prep: per-vector scale =
        // max|x|/127, element q = ⌊x/scale + 0.5⌋ (floor(+0.5) because both
        // engines floor doubles identically, while round()'s half-rule
        // differs). Embarrassingly parallel, no shuffle before the output
        // sort; emitted as (vec_id, dim, q) rows plus the r4'd scale so the
        // dequantization contract is checkable.
        val e = Tables.embeddings(s, dir)
          .withColumn("scale",
            aggregate(col("embedding"), lit(0.0d),
              (m, x) => greatest(m, abs(x.cast("double")))) / 127.0)
        e.select(col("vec_id"), col("scale"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .withColumn("q", when(col("scale") === 0, 0L).otherwise(
            floor(col("x").cast("double") / col("scale") + 0.5).cast("long")))
          // quantize with the RAW scale; round it only for the output row
          .select(col("vec_id"), col("dim"), col("q"), r4(col("scale")).as("scale"))
          .orderBy("vec_id", "dim")
      },
      Some("""WITH e AS (SELECT vec_id, embedding,
              list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
              FROM embeddings)
            SELECT vec_id, i - 1 AS dim,
              CASE WHEN scale = 0 THEN 0
                ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5) AS BIGINT)
              END AS q,
              round(scale, 4) AS scale
            FROM e, UNNEST(generate_series(1, 64)) AS t(i)
            ORDER BY vec_id, dim""")),

    GQuery(
      "q_emb_project",
      (s, dir) => {
        // Signed random projection 64 → 8 dims (Achlioptas ±1 planes —
        // the cheap Johnson-Lindenstrauss instance): the dimensionality-
        // reduction step before sketching/clustering when full embeddings
        // are too wide to shuffle. Planes are the deterministic ±1
        // lshPlane family, computed once on the driver and shipped as
        // literals into BOTH engines — the projection is 8 dot products
        // per row, embarrassingly parallel, no shuffle before the output
        // sort. ±1 components keep the per-element products exact in
        // float and double, so only the summation order is engine-
        // sensitive — handled by the usual r4 contract.
        val planes = (0 until 8).map(j => lshPlane(5000 + j, 64))
        val projs = planes.map { p =>
          aggregate(
            zip_with(col("embedding"), typedLit(p), (x, w) => x.cast("double") * w),
            lit(0.0d), (acc, v) => acc + v)
        }
        Tables.embeddings(s, dir)
          .select(col("vec_id"), posexplode(array(projs: _*)).as(Seq("pdim", "y")))
          .select(col("vec_id"), col("pdim"), r4(col("y")).as("y"))
          .orderBy("vec_id", "pdim")
      },
      Some {
        val planes = (0 until 8).map(j =>
          graft.functions.VectorFunctions.lshPlane(5000 + j, 64))
        val branches = planes.zipWithIndex.map { case (p, j) =>
          val lst = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
          s"""SELECT vec_id, $j AS pdim,
             round(list_sum(list_transform(range(1, 65),
               i -> CAST(embedding[i] AS DOUBLE) * ($lst)[i])), 4) AS y
             FROM embeddings"""
        }
        branches.mkString("", " UNION ALL ", " ORDER BY vec_id, pdim")
      }),

    GQuery(
      "q_emb_centroid",
      (s, dir) => {
        // Per-label centroid, emitted as (label, dim, value) rows — the
        // row form sidesteps cross-engine array-compare pitfalls.
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg(r4(sum(col("v").cast(DecimalType(28, 10))).cast("double") / count(lit(1)))
            .as("c"))
          .orderBy("label", "dim")
      },
      Some("""SELECT label, i - 1 AS dim,
             round(CAST(SUM(CAST(embedding[i] AS DECIMAL(28,10))) AS DOUBLE) / count(*), 4) AS c
             FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_index_fresh",
      (s, dir) => {
        // The namesake loop as ONE CATALOG-VISIBLE flow (VERDICT r10 item
        // 5): bootstrap a physical IndexedLayout over a bounded corpus
        // slice, drive two CDC epochs through IndexSync.applyBatch (an
        // add, an in-place update, a delete, then a delete of the add),
        // compact, and answer a top-k over the LIVE state. nprobe ==
        // kCells makes the search exact, so the row is ORACLE-CHECKABLE:
        // the add that was deleted must never appear, the delete must be
        // gone, and the update must answer with its NEW value — the
        // oracle reconstructs the same live state in SQL (float-exact:
        // the update is a sign flip). Planning-time pruning is
        // IndexedLayoutSpec's proof; THIS row proves CDC freshness end to
        // end through the real loop verbs (reference analog: the e2e
        // detect→payload round-trip, test/e2e/e2e_test.go:401-456).
        import graft.pipeline.IndexSync
        import graft.pipeline.VectorSync.VecEvent
        import s.implicits._
        val corpus = Tables.embeddings(s, dir)
          .filter(col("vec_id") < 200).select("vec_id", "embedding")
        // one bounded pass pins the three fixture vectors the CDC script
        // needs; a corpus slice that lacks any of them (incl. the fully
        // empty case, EmptyInputSpec) degenerates to the empty result —
        // no unguarded .head on a partial fixture
        val fixture = corpus.filter(col("vec_id").isin(3L, 17L, 23L))
          .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        if (!Seq(3L, 17L, 23L).forall(fixture.contains))
          Seq.empty[(Long, Int, Long, Double)].toDF("q_id", "rnk", "vec_id", "cos")
        else {
          val d = java.nio.file.Files.createTempDirectory("graft_fresh").toString
          try {
            IndexedLayout.write(s, corpus, d, kCells = 4)
            IndexSync.applyBatch(s, Seq(
              VecEvent("ADD", 1, 9000001L, fixture(3L).map(_ * 0.9f), 0),
              VecEvent("UPDATE", 2, 17L, fixture(17L).map(-_), 0),
              VecEvent("DELETE", 3, 23L, Array.empty[Float], 0)),
              epochId = 1L, layoutDir = d, graphDir = null)
            IndexSync.applyBatch(s, Seq(
              VecEvent("DELETE", 4, 9000001L, Array.empty[Float], 0)),
              epochId = 2L, layoutDir = d, graphDir = null)
            IndexedLayout.compact(s, d)
            val queries = corpus.filter(col("vec_id") < 5)
              .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
            // eager localCheckpoint materializes the (bounded, ≤ 4·k-row)
            // answer off the layout files so the temp dir can be deleted
            // before the caller consumes the frame — no leaked bootstrap
            // layout per Verify/parity invocation
            IndexedLayout.prunedTopK(s, d, queries, k = 5, nprobe = 4)
              .localCheckpoint()
          } finally org.apache.commons.io.FileUtils
            .deleteQuietly(new java.io.File(d))
        }
      },
      Some(s"""WITH live AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 200 AND vec_id NOT IN (17, 23)
                UNION ALL
                SELECT vec_id, list_transform(embedding, x -> -x) AS embedding
                FROM embeddings WHERE vec_id = 17),
              scored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN live c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 5
                  AND (SELECT count(DISTINCT vec_id) FROM embeddings WHERE vec_id IN (3, 17, 23)) = 3),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk FROM scored)
              SELECT q_id, rnk, vec_id, round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk"""),
      // correctness-gated but not TIMED: the flow's ~4-5 s is per-epoch
      // fs-commit overhead on a size-bounded fixture (invariant in sf by
      // construction), not data processing — the loop's real rate is
      // BENCH's indexsync_upserts_per_s
      bench = false),

    GQuery(
      "q_index_asof",
      (s, dir) => {
        // TIME TRAVEL on the physical index (the Delta/lakehouse snapshot
        // verb, served by the layout's own epoch history — every CDC verb
        // already lands as a new epoch's files + tombstones, so a
        // snapshot read is two monotone filters, readCorpus(asOf)): two
        // CDC epochs land (add 9000001 = −v3, update 17 → −v17, delete
        // 23; then delete 9000001), and the search answers AS OF epoch 1
        // — the since-deleted 9000001 must ANSWER, 23 must not, 17 must
        // answer with its epoch-1 value — while the live view differs.
        // nprobe == kCells makes the snapshot search exact, so the oracle
        // reconstructs the epoch-1 state in SQL; the sign-flip edits keep
        // every float bit-exact. No compact here: compaction raises the
        // history floor (IndexedLayoutTimeTravelSpec proves the clamp).
        import graft.pipeline.IndexSync
        import graft.pipeline.VectorSync.VecEvent
        import s.implicits._
        val corpus = Tables.embeddings(s, dir)
          .filter(col("vec_id") < 200).select("vec_id", "embedding")
        val fixture = corpus.filter(col("vec_id").isin(3L, 17L, 23L))
          .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        if (!Seq(3L, 17L, 23L).forall(fixture.contains))
          Seq.empty[(Long, Int, Long, Double)].toDF("q_id", "rnk", "vec_id", "cos")
        else {
          val d = java.nio.file.Files.createTempDirectory("graft_asof").toString
          try {
            IndexedLayout.write(s, corpus, d, kCells = 4)
            IndexSync.applyBatch(s, Seq(
              VecEvent("ADD", 1, 9000001L, fixture(3L).map(-_), 0),
              VecEvent("UPDATE", 2, 17L, fixture(17L).map(-_), 0),
              VecEvent("DELETE", 3, 23L, Array.empty[Float], 0)),
              epochId = 1L, layoutDir = d, graphDir = null)
            IndexSync.applyBatch(s, Seq(
              VecEvent("DELETE", 4, 9000001L, Array.empty[Float], 0)),
              epochId = 2L, layoutDir = d, graphDir = null)
            val queries = corpus.filter(col("vec_id") < 5)
              .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
            IndexedLayout.prunedTopK(s, d, queries, k = 5, nprobe = 4,
              asOf = 1).localCheckpoint()
          } finally org.apache.commons.io.FileUtils
            .deleteQuietly(new java.io.File(d))
        }
      },
      Some(s"""WITH live1 AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < 200 AND vec_id NOT IN (17, 23)
                UNION ALL
                SELECT vec_id, list_transform(embedding, x -> -x) AS embedding
                FROM embeddings WHERE vec_id = 17
                UNION ALL
                SELECT 9000001 AS vec_id,
                       list_transform(embedding, x -> -x) AS embedding
                FROM embeddings WHERE vec_id = 3),
              scored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN live1 c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 5
                  AND (SELECT count(DISTINCT vec_id) FROM embeddings WHERE vec_id IN (3, 17, 23)) = 3),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk FROM scored)
              SELECT q_id, rnk, vec_id, round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk"""),
      bench = false),

    GQuery(
      "q_index_cdf",
      (s, dir) => {
        // CHANGE DATA FEED off the physical index's epoch history (the
        // Delta CDF verb, IndexedLayout.changesBetween): the same two CDC
        // epochs as q_index_asof land (add 9000001 = −v3, update 17 →
        // −v17, delete 23; then delete 9000001), and the NET diff 0→2
        // must be exactly {upsert 17 with its new value, delete 23} — the
        // add-then-delete of 9000001 nets out, the update emits its FINAL
        // embedding (sign-flip keeps floats exact), and a downstream
        // consumer applying this diff to snapshot 0 lands on snapshot 2
        // (IndexedLayoutCdfSpec proves that contract on real history).
        import graft.pipeline.IndexSync
        import graft.pipeline.VectorSync.VecEvent
        import s.implicits._
        val corpus = Tables.embeddings(s, dir)
          .filter(col("vec_id") < 200).select("vec_id", "embedding")
        val fixture = corpus.filter(col("vec_id").isin(3L, 17L, 23L))
          .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        if (!Seq(3L, 17L, 23L).forall(fixture.contains))
          Seq.empty[(String, Long, Double)].toDF("change", "vec_id", "v0")
        else {
          val d = java.nio.file.Files.createTempDirectory("graft_cdf").toString
          try {
            IndexedLayout.write(s, corpus, d, kCells = 4)
            IndexSync.applyBatch(s, Seq(
              VecEvent("ADD", 1, 9000001L, fixture(3L).map(-_), 0),
              VecEvent("UPDATE", 2, 17L, fixture(17L).map(-_), 0),
              VecEvent("DELETE", 3, 23L, Array.empty[Float], 0)),
              epochId = 1L, layoutDir = d, graphDir = null)
            IndexSync.applyBatch(s, Seq(
              VecEvent("DELETE", 4, 9000001L, Array.empty[Float], 0)),
              epochId = 2L, layoutDir = d, graphDir = null)
            IndexedLayout.changesBetween(s, d, 0, 2)
              .select(col("change"), col("vec_id"),
                r4(element_at(col("embedding"), 1).cast("double")).as("v0"))
              .orderBy("change", "vec_id")
              .localCheckpoint()
          } finally org.apache.commons.io.FileUtils
            .deleteQuietly(new java.io.File(d))
        }
      },
      Some("""SELECT 'upsert' AS change, CAST(17 AS BIGINT) AS vec_id,
                     round(-CAST(embedding[1] AS DOUBLE), 4) AS v0
              FROM embeddings WHERE vec_id = 17
                AND (SELECT count(DISTINCT vec_id) FROM embeddings WHERE vec_id IN (3, 17, 23)) = 3
              UNION ALL
              SELECT 'delete' AS change, CAST(23 AS BIGINT) AS vec_id,
                     NULL AS v0
              FROM embeddings WHERE vec_id = 23
                AND (SELECT count(DISTINCT vec_id) FROM embeddings WHERE vec_id IN (3, 17, 23)) = 3
              ORDER BY change, vec_id"""),
      bench = false),

    GQuery(
      "q_hybrid_rrf",
      (s, dir) => {
        // HYBRID SEARCH: lexical + vector retrieval fused by Reciprocal
        // Rank Fusion (Cormack et al., SIGIR'09: score = Σ 1/(60+rank)) —
        // the query mode a production vector DB serves alongside pure ANN,
        // exercising the documents↔embeddings id alignment. Lexical side:
        // an INVERTED-INDEX candidate join — query tokens (broadcast-small)
        // meet the postings list (doc, token), scored by idf summed in
        // EXACT DECIMAL (idf pre-rounded to 6 — the one float op — then
        // summed associatively, so the cross-engine sum order can't flip a
        // rank). Ultra-common tokens (df·2 > N) are pruned from scoring:
        // the classic stop-word cap that keeps posting-list joins bounded
        // at 100 TB — an explicit, deterministic integer rule, mirrored in
        // the oracle. Vector side: the q_sim_topk broadcast-query scan.
        // Fusion touches only the two k-bounded rank lists (full outer on
        // (q, doc), ≤ 2k rows per query), with every rank an integer and
        // the RRF sum a fixed-order two-term double — deterministic across
        // engines. Output: top-5 fused per query.
        import graft.functions.TextFunctions.tokens
        val docs = Tables.documents(s, dir)
        val tf = docs.select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("token"))
          .localCheckpoint() // feeds postings, df, AND the query side
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val idf = tf.groupBy("token").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .filter(col("df") * 2 <= col("n_docs")) // stop-word cap
          .withColumn("idf", round(
            log(col("n_docs").cast("double") / col("df")), 6)
            .cast(DecimalType(18, 6)))
          .select("token", "idf")
        val qTok = tf.filter(col("doc_id") < 3)
          .select(col("doc_id").as("q_id"), col("token"))
        val wl = Window.partitionBy("q_id")
          .orderBy(col("lex").desc, col("doc_id").asc)
        val lex = qTok.join(tf, "token")
          .filter(col("doc_id") =!= col("q_id"))
          .join(idf, "token")
          .groupBy("q_id", "doc_id").agg(sum("idf").as("lex"))
          .withColumn("lrank", row_number().over(wl))
          .filter(col("lrank") <= 10)
          .select("q_id", "doc_id", "lrank")
        val e = Tables.embeddings(s, dir)
          .withColumn("nrm", l2Norm(col("embedding")))
        val q = broadcast(e.filter(col("vec_id") < 3).select(
          col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_n")))
        val wv = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        val vec = q.join(e, col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(cosineWithNorms(
            col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .withColumn("vrank", row_number().over(wv))
          .filter(col("vrank") <= 10)
          .select(col("q_id"), col("vec_id").as("doc_id"), col("vrank"))
        val wf = Window.partitionBy("q_id")
          .orderBy(col("rrf").desc, col("doc_id").asc)
        lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
          .withColumn("rrf", round(
            coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)), 6))
          .withColumn("rnk", row_number().over(wf))
          .filter(col("rnk") <= 5)
          .select("q_id", "rnk", "doc_id", "rrf")
          .orderBy("q_id", "rnk")
      },
      Some(hybridRrfOracle)),

    GQuery(
      "q_hybrid_rrf_idx",
      (s, dir) => {
        // The SAME hybrid RRF search SERVED FROM THE PERSISTED INDEXES —
        // the production shape of q_hybrid_rrf: the lexical rank list
        // comes from the inverted index's pruned posting buckets
        // (InvertedIndex.idfTopK — planning-time bucket pruning, at 100 TB
        // a k-token query reads ≤ k/Buckets of the index) and the vector
        // rank list from the cell-partitioned layout
        // (IndexedLayout.prunedTopK, nprobe = all cells here so the list
        // is exact and the row stays ORACLE-CHECKABLE; production trades
        // nprobe for recall). Scoring trees are shared with the direct
        // row, so the fused result is oracle-exact against the IDENTICAL
        // SQL — the evidence that a user can swap the scan-based hybrid
        // for the index-based one without an answer change. Fusion
        // touches only the two k-bounded rank lists.
        val docs = Tables.documents(s, dir)
        val embs = Tables.embeddings(s, dir)
        if (docs.limit(1).isEmpty || embs.limit(1).isEmpty) {
          // zero-row contract (EmptyInputSpec): nothing to index
          import s.implicits._
          Seq.empty[(Long, Int, Long, Double)]
            .toDF("q_id", "rnk", "doc_id", "rrf")
        } else {
          val dLex = java.nio.file.Files
            .createTempDirectory("graft_hyb_lex").toString
          val dVec = java.nio.file.Files
            .createTempDirectory("graft_hyb_vec").toString
          try {
            InvertedIndex.build(s, docs.select("doc_id", "text"), dLex)
            val nc = IndexedLayout.write(s,
              embs.select("vec_id", "embedding"), dVec, kCells = 8)
            HybridSearch.fromIndexes(s, dLex, dVec,
              docs.filter(col("doc_id") < 3)
                .select(col("doc_id").as("q_id"), col("text")),
              embs.filter(col("vec_id") < 3)
                .select(col("vec_id").as("q_id"),
                  col("embedding").as("q_emb")),
              k = 5, shortK = 10, nprobe = nc, excludeQueryDoc = true)
              .localCheckpoint()
          } finally {
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dLex))
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dVec))
          }
        }
      },
      // the IDENTICAL oracle as q_hybrid_rrf — that is the point
      Some(hybridRrfOracle),
      // fixture-bound fs work (the q_rank_bm25_idx convention):
      // correctness-gated, excluded from the timed catalog
      bench = false),

    GQuery(
      "q_sim_topk_diverse",
      (s, dir) => {
        // DIVERSITY-CAPPED retrieval (the Elasticsearch field-collapse /
        // Vespa grouping verb): top-5 per query with AT MOST 2 results
        // per lang facet — a result list that would otherwise be swamped
        // by one dominant source keeps cross-facet variety. Semantics:
        // candidates are admitted in score order but a facet's 3rd-best
        // is skipped, expressed as two stacked windows — within-(q,facet)
        // rank caps the facet, then the global rank runs over the capped
        // SURVIVORS (≤ 2·|langs| rows per query), so the expensive window
        // is the first one and the global one touches a bounded frame:
        // exactly the TopKPerKey two-phase shape, with the facet cap as
        // the partial phase. The facet rides the corpus scan as a join on
        // the documents↔embeddings id alignment, like q_sim_topk_filtered.
        val lang = Tables.documents(s, dir)
          .select(col("doc_id").as("vec_id"), col("lang"))
        val e = Tables.embeddings(s, dir).withColumn("nrm", l2Norm(col("embedding")))
        val corpus = e.join(lang, Seq("vec_id"))
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_n")))
        val wf = Window.partitionBy("q_id", "lang")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        val wg = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        // scalars-only into the windows (the q_sim_mmr discipline): the
        // output never needs the vectors back, so the facet window's
        // exchange carries (q_id, vec_id, lang, cos_r) — not the arrays
        q.join(corpus, col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(
            cosineWithNorms(col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
          .select("q_id", "vec_id", "lang", "cos_r")
          .withColumn("frnk", row_number().over(wf))
          .filter(col("frnk") <= 2)
          .withColumn("rnk", row_number().over(wg))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"), col("lang"),
            r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      Some(s"""WITH scored AS (
                SELECT q.vec_id AS q_id, c.vec_id, d.lang,
                       round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_r
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                JOIN documents d ON d.doc_id = c.vec_id
                WHERE q.vec_id < 10),
              capped AS (SELECT *, row_number() OVER (
                PARTITION BY q_id, lang ORDER BY cos_r DESC, vec_id ASC) AS frnk
                FROM scored),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk
                FROM capped WHERE frnk <= 2)
              SELECT q_id, rnk, vec_id, lang, round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""")),

    GQuery(
      "q_sim_topk_sq",
      (s, dir) => {
        // SCALAR-QUANTIZED (int8) search — the SQ sibling of q_sim_topk_pq:
        // corpus and queries quantize per-vector under q_emb_quant's exact
        // contract (scale = max|x|/127, q = ⌊x/scale + 0.5⌋), candidates
        // score in the COMPRESSED domain first. The per-vector scales
        // CANCEL in cosine, so the approximate score is exactly the cosine
        // of the integer vectors — an exact int64 dot product with only
        // the final division in float, which is why this row is
        // ORACLE-EXACT where the codebook-trained PQ row is rows-only.
        // Top-20 shortlist per query by the rounded approx score, then the
        // full-precision re-rank touches ONLY the shortlist — the ADC
        // shape: at 100 TB the scan reads the 4×-smaller int8 column
        // family and full floats for 20 rows/query. Both scores round to
        // 6, ties break on vec_id.
        def idot(a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
        val e = Tables.embeddings(s, dir)
          .withColumn("scale",
            aggregate(col("embedding"), lit(0.0d),
              (m, x) => greatest(m, abs(x.cast("double")))) / 127.0)
          .withColumn("qv", when(col("scale") === 0,
              transform(col("embedding"), _ => lit(0L)))
            .otherwise(transform(col("embedding"),
              x => floor(x.cast("double") / col("scale") + 0.5).cast("long"))))
          // int norm as a narrow pre-join projection (the float path's
          // nrm trick): scoring a pair costs ONE integer dot product, not
          // three — value-identical to the oracle's inline self-dots
          .withColumn("qn", sqrt(idot(col("qv"), col("qv")).cast("double")))
          .select("vec_id", "embedding", "qv", "qn")
        val q = broadcast(
          e.filter(col("vec_id") < 10).select(
            col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("qv").as("q_qv"), col("qn").as("q_qn")))
        val ws = Window.partitionBy("q_id")
          .orderBy(col("acos_r").desc, col("vec_id").asc)
        val wr = Window.partitionBy("q_id")
          .orderBy(col("cos_r").desc, col("vec_id").asc)
        q.join(e, col("q_id") =!= col("vec_id"))
          .withColumn("den", col("q_qn") * col("qn"))
          .withColumn("acos_r", round(when(col("den") === 0, lit(0.0d))
            .otherwise(idot(col("q_qv"), col("qv")).cast("double") / col("den")), 6))
          .withColumn("srnk", row_number().over(ws))
          .filter(col("srnk") <= 20)
          .withColumn("cos_r", round(
            cosineSimilarity(col("q_emb"), col("embedding")), 6))
          .withColumn("rnk", row_number().over(wr))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("vec_id"),
            r4(col("acos_r")).as("acos"), r4(col("cos_r")).as("cos"))
          .orderBy("q_id", "rnk")
      },
      Some {
        def dint(a: String, b: String) =
          s"""list_sum(list_transform(range(1, len($a) + 1),
             i -> $a[i] * $b[i]))"""
        s"""WITH e AS (SELECT vec_id, embedding,
                list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                FROM embeddings),
              qz AS (SELECT vec_id, embedding,
                CASE WHEN scale = 0
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
                END AS qv FROM e),
              adc AS (
                SELECT q.vec_id AS q_id, c.vec_id, q.embedding AS q_emb,
                       c.embedding AS c_emb,
                       round(CASE WHEN sqrt(CAST(${dint("q.qv", "q.qv")} AS DOUBLE)) *
                                       sqrt(CAST(${dint("c.qv", "c.qv")} AS DOUBLE)) = 0
                         THEN 0.0
                         ELSE CAST(${dint("q.qv", "c.qv")} AS DOUBLE) /
                              (sqrt(CAST(${dint("q.qv", "q.qv")} AS DOUBLE)) *
                               sqrt(CAST(${dint("c.qv", "c.qv")} AS DOUBLE)))
                       END, 6) AS acos_r
                FROM qz q JOIN qz c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 10),
              short AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY acos_r DESC, vec_id ASC) AS srnk
                FROM adc),
              exact AS (
                SELECT q_id, vec_id, acos_r,
                       round(${duckCos("q_emb", "c_emb")}, 6) AS cos_r
                FROM short WHERE srnk <= 20),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY cos_r DESC, vec_id ASC) AS rnk
                FROM exact)
              SELECT q_id, rnk, vec_id, round(acos_r, 4) AS acos,
                     round(cos_r, 4) AS cos
              FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk"""
      })
  )
}
