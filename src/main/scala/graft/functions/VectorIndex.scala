package graft.functions

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index construction: a k-means centroid table (the coarse quantizer)
  * plus cell assignments, so similarity search scans one cell instead of the
  * corpus — the 100 TB scale path SURVEY.md §2.B-LLM sketches, where the
  * corpus is partitioned/bucketed by cell.
  *
  * Lloyd's algorithm, Spark-shaped and deterministic:
  *   - init: the k smallest vectors by (xxhash64(vec_id), vec_id) — a
  *     deterministic pseudo-random spread across the corpus (no RNG)
  *   - assign: broadcast the k centroids, one pass over the corpus taking
  *     the max-cosine cell (ties → lowest cell id)
  *   - update: per-cell mean via posexplode + groupBy(cell, dim) — a partial
  *     +final aggregation, never collecting vectors to the driver
  *
  * Each iteration is two narrow passes + one dim-keyed aggregation; nothing
  * scales with corpus² — at 1000 executors the assign step is embarrassingly
  * parallel and the update shuffles k·dim rows.
  */
object VectorIndex {

  /** Driver-side collect budget for index training (VERDICT r7 item 7).
    *
    * The centroid/codebook tables — k·dim doubles for IVF, m·k·(dim/m) =
    * k·dim for PQ — are the ONLY corpus-derived state that ever lands on
    * the driver; everything else stays distributed. That bound is the
    * 100 TB training contract: the training INPUT must be an explicit
    * upstream sample (`df.sample(...)` / a sampled scan), never the full
    * corpus, and an oversized k·dim fails loudly here at train time
    * instead of as an opaque driver OOM mid-job.
    *
    * 2^24 doubles ≈ 128 MiB — generous for any sane codebook (FAISS-scale
    * IVF uses k ≤ 2^20 cells at dim ≤ 1024 only with sharded training).
    */
  val MaxDriverEntries: Long = 1L << 24

  private def requireDriverBudget(what: String, entries: Long, budget: Long): Unit =
    require(entries <= budget,
      s"$what would collect $entries entries to the driver (budget $budget): " +
        "reduce k (or m·k) / dim, or train on an explicit sample")

  /** (cell INT, centroid ARRAY<DOUBLE>) after `iters` Lloyd iterations. */
  def kmeansCentroids(
      spark: SparkSession,
      embeddings: DataFrame, // (vec_id LONG, embedding ARRAY<FLOAT>)
      k: Int,
      iters: Int,
      maxDriverEntries: Long = MaxDriverEntries): DataFrame = {
    import spark.implicits._
    val dim = embeddings.select(size(col("embedding"))).take(1)
      .headOption.map(_.getInt(0)).getOrElse(0)
    requireDriverBudget("IVF centroid table", k.toLong * dim, maxDriverEntries)
    // SEEDING (deterministic, two defenses — both failure modes measured):
    //   1. SPREAD: the candidate pool is the 4k smallest vectors by
    //      (xxhash64(vec_id), vec_id) — a deterministic pseudo-random
    //      sample of the WHOLE corpus, still a TakeOrdered (per-partition
    //      top-k, no full sort). First-k-by-id seeding degrades whenever
    //      id order correlates with content locality (at 100 TB the
    //      lowest ids are one ingest shard): on the ×5 ScaleProbe corpus —
    //      five id-contiguous replica populations — first-k seeds all
    //      landed in replica 0 and the Lloyd passes could not recover,
    //      collapsing IVF graph recall to 0.392.
    //   2. SEPARATION: greedy farthest-point (k-center) selection over the
    //      pool by cosine distance — plain hash-order seeding puts two
    //      seeds in one cluster at small k (the classic k-means bad-init),
    //      which Lloyd's empty-cell-keeps-centroid rule then can't split.
    //      O(pool·k·dim) driver arithmetic on the budget-bounded pool.
    // The pool collect is the same k·dim budget class as the per-iteration
    // centroid refresh below (≤4× it, capped against the entry budget);
    // an unpartitioned row_number window instead would move the rows to
    // one task AND spam "No Partition Defined for Window" everywhere.
    val poolN = math.min(math.max(k * 4, 64),
      math.max(k, (maxDriverEntries / math.max(dim, 1)).toInt))
    val pool = embeddings
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(poolN)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map { case (id, v) => (id, v.toArray) }
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      1.0 - (if (d == 0) 0.0 else dot / d)
    }
    val seeds = if (pool.isEmpty) Array.empty[(Long, Array[Double])] else {
      val nSeeds = math.min(k, pool.length)
      val taken = new Array[Boolean](pool.length)
      val minD = Array.fill(pool.length)(Double.MaxValue)
      val chosen = scala.collection.mutable.ArrayBuffer(pool.head)
      taken(0) = true
      while (chosen.length < nSeeds) {
        val last = chosen.last._2
        var bestI = -1; var bestD = -1.0
        var i = 0
        while (i < pool.length) {
          if (!taken(i)) {
            val d = math.min(minD(i), cosDist(pool(i)._2, last))
            minD(i) = d
            if (d > bestD) { bestD = d; bestI = i } // first max wins: pool is
            i += 1                                  // vec_id-sorted, so ties
          } else i += 1                             // break deterministically
        }
        taken(bestI) = true
        chosen += pool(bestI)
      }
      chosen.toArray
    }
    var centroids = seeds.sortBy(_._1).zipWithIndex
      .map { case ((_, v), cell) => (cell, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
    (0 until iters).foreach { _ =>
      val assigned = assignCells(embeddings, centroids)
      // PARTITION-INVARIANT update (r19, VERDICT r18 item 7): the mean
      // accumulates in exact DECIMAL — each float casts to a fixed
      // 12-decimal value once, and exact addition regroups freely — so the
      // centroid table no longer depends on partition layout (a plain
      // double avg() sums in shuffle-arrival order and shifts ulps under
      // any partitioning change). This retires the whole "can't spread,
      // float layout" hold class on the IVF family: every kmeans consumer
      // (ivfTopK, IndexedLayout, KnnGraphBuild, GraphServing seeds) now
      // gets the same centroids at any width. DecimalType(18,12), not a
      // wider type: precision ≤ 18 keeps every value on Spark's compact
      // long fast path (a (38,18) first cut paid BigDecimal adds per
      // element — measured +0.1-0.8 s across the family); unit-scale
      // embedding components fit 6 integer digits with 500× headroom, and
      // a sum that ever outgrew the compact range would promote, not
      // overflow. Division by the member count and the final double cast
      // are deterministic per value.
      val updated = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 12)))
          / count(lit(1))).cast("double").as("c"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("entries"))
        .select(col("cell"),
          expr("transform(entries, e -> e.c)").as("centroid"))
      // truncate lineage: each Lloyd iteration would otherwise recompute all
      // prior iterations per action; the centroid table is k·dim doubles, so
      // collect it and restart the plan from a literal dataset. A cell with
      // zero members produces no update row — keep its previous centroid
      // rather than letting k silently shrink. A corpus with fewer than k
      // vectors seeds fewer than k cells in the first place (and an empty
      // corpus seeds none): only cells that exist flow forward.
      val updatedMap = updated.as[(Int, Seq[Double])].collect().toMap
      val prevMap = centroids.as[(Int, Seq[Double])].collect().toMap
      val rows = (0 until k).flatMap(c =>
        updatedMap.get(c).orElse(prevMap.get(c)).map(c -> _))
      centroids = rows.toDF("cell", "centroid")
    }
    centroids
  }

  /** Tag each vector with its nearest (max-cosine) cell; ties → lowest id.
    * Centroids are broadcast; the argmax is a partial+final max_by
    * aggregation, so the exchange carries one pre-combined row per vector —
    * not the corpus×k rows a window-over-vec_id would shuffle. Norms are
    * precomputed on each side BEFORE the pair explosion (the
    * cosineWithNorms contract): scoring one of the N·k pairs costs one dot
    * product, not three — bit-identical results, ~3× less assign-step
    * arithmetic per Lloyd pass.
    */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val e = embeddings
      .withColumn("_v", col("embedding").cast("array<double>"))
      .withColumn("_vn", l2Norm(col("_v")))
    val c = centroids.withColumn("_cn", l2Norm(col("centroid")))
    e.crossJoin(broadcast(c))
      .withColumn("sim",
        cosineWithNorms(col("_v"), col("centroid"), col("_vn"), col("_cn")))
      .groupBy("vec_id")
      .agg(
        max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"),
        first(col("embedding")).as("embedding")) // identical across the k copies
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", PAMI 2011): split each vector into m subvectors,
  // k-means each subspace independently, store each vector as m byte-sized
  // codes. Search runs in the compressed domain via ADC — per query, one
  // m·k lookup table of subspace dot products; a vector's estimated dot is
  // the sum of m table entries. At 100 TB the corpus lives as codes
  // (m bytes/vector instead of 4·dim), the codebooks and LUTs broadcast,
  // and the scan is one narrow pass + a (q, vec) sum aggregation.
  // ---------------------------------------------------------------------

  /** (vec_id, sub, subvec ARRAY<DOUBLE>): vector split into m slices. */
  def subvectors(embeddings: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val d = dim / m
    val slices = array((0 until m).map(j =>
      slice(col("embedding").cast("array<double>"), j * d + 1, d)): _*)
    embeddings.select(col("vec_id"), posexplode(slices).as(Seq("sub", "subvec")))
  }

  /** (sub, cell, centroid ARRAY<DOUBLE>) — one k-codebook per subspace,
    * all m subspaces trained in the SAME Lloyd passes (keyed by sub), so
    * the iteration count, not m, bounds the number of jobs. Deterministic:
    * init from the first k vectors by vec_id, L2 assignment with
    * ties → lowest cell, per-(sub, cell, dim) mean update.
    *
    * `sv` is the subvector frame from [[subvectors]] — the caller should
    * `localCheckpoint()` it ONCE and reuse it for [[pqEncode]]: training
    * consumes it every Lloyd pass, and unmaterialized each pass would
    * re-run the scan+normalize+explode subtree (the q_dedup_jaccard
    * lesson). The codebook itself (m·k·(dim/m) doubles) lives driver-side
    * between iterations — one distributed job per pass, nothing
    * corpus-sized ever collected.
    */
  def pqCodebooks(
      spark: SparkSession,
      sv: DataFrame, // (vec_id, sub, subvec) from subvectors()
      m: Int,
      k: Int,
      iters: Int,
      maxDriverEntries: Long = MaxDriverEntries): DataFrame = {
    import spark.implicits._
    val subDim = sv.select(size(col("subvec"))).take(1)
      .headOption.map(_.getInt(0)).getOrElse(0)
    requireDriverBudget("PQ codebook", m.toLong * k * subDim, maxDriverEntries)
    // init: the first k vectors by vec_id = the first m·k (vec_id, sub) rows
    val first = sv.orderBy("vec_id", "sub").limit(m * k)
      .select(col("sub"), col("vec_id"), col("subvec"))
      .as[(Int, Long, Seq[Double])].collect()
    var books: Map[(Int, Int), Seq[Double]] = first.groupBy(_._1).toSeq.flatMap {
      case (sub, rows) =>
        rows.sortBy(_._2).zipWithIndex.toSeq.map { case ((_, _, v), cell) =>
          (sub, cell) -> v
        }
    }.toMap
    def toDf(b: Map[(Int, Int), Seq[Double]]): DataFrame =
      b.toSeq.map { case ((s, c), v) => (s, c, v) }.toDF("sub", "cell", "centroid")
    (0 until iters).foreach { _ =>
      val updated = assignPq(sv, toDf(books))
        .select(col("sub"), col("cell"), posexplode(col("subvec")).as(Seq("dim", "v")))
        .groupBy("sub", "cell", "dim")
        .agg(avg(col("v")).as("c"))
        .groupBy("sub", "cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("entries"))
        .select(col("sub"), col("cell"),
          expr("transform(entries, e -> e.c)").as("centroid"))
        .as[(Int, Int, Seq[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // an empty cell keeps its previous centroid — k must not shrink
      books = books.map { case (key, prev) => key -> updated.getOrElse(key, prev) }
    }
    toDf(books)
  }

  /** Driver-side PQ training over a budget-bounded sample — the FAISS-shaped
    * alternative to [[pqCodebooks]]: codebook training touches k·dim-scale
    * state no matter where it runs, so at 100 TB the input is an explicit
    * SAMPLE anyway (the [[MaxDriverEntries]] contract) and running Lloyd on
    * the collected sample replaces a per-iteration distributed job chain
    * (broadcast + 3 shuffles + collect, ~2 s of fixed overhead per pass at
    * local[32]) with in-memory arithmetic. Semantics mirror [[pqCodebooks]]
    * exactly: init = first k vectors by vec_id per subspace, L2 assignment
    * with ties → lowest cell, per-dim mean update (summed in vec_id order —
    * deterministic), empty cells keep their previous centroid. The collect
    * is LOUDLY bounded: more sample rows than the entry budget admits is a
    * require failure, never a silent truncation or a driver OOM.
    */
  def pqCodebooksDriver(
      spark: SparkSession,
      sv: DataFrame, // (vec_id, sub, subvec) from subvectors() — the sample
      m: Int,
      k: Int,
      iters: Int,
      subDim: Int,
      maxDriverEntries: Long = MaxDriverEntries): DataFrame = {
    import spark.implicits._
    require(subDim > 0, s"subDim must be positive, got $subDim")
    val maxRows = (maxDriverEntries / subDim).toInt
    val rows = sv.select(col("vec_id"), col("sub"), col("subvec"))
      .as[(Long, Int, Seq[Double])].limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"PQ training sample exceeds the driver budget " +
        s"($maxRows rows at subDim $subDim): train on an explicit sample")
    val books = rows.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (sub, rs) =>
      val vecs = rs.sortBy(_._1).map(_._3.toArray)
      var cents: Array[Array[Double]] = vecs.take(k).map(_.clone())
      (0 until iters).foreach { _ =>
        val assign = vecs.map { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < v.length) { val x = v(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c } // strict < keeps lowest cell on ties
            c += 1
          }
          best
        }
        cents = cents.indices.map { c =>
          val members = assign.iterator.zipWithIndex
            .collect { case (`c`, i) => vecs(i) }.toArray
          if (members.isEmpty) cents(c)
          else {
            val s = new Array[Double](members.head.length)
            members.foreach { v =>
              var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
            }
            s.map(_ / members.length)
          }
        }.toArray
      }
      cents.zipWithIndex.map { case (cv, cell) => (sub, cell, cv.toSeq) }
    }
    books.toDF("sub", "cell", "centroid")
  }

  /** Nearest codebook entry per (vec_id, sub) under L2; ties → lowest cell.
    * Same partial+final max_by shape as [[assignCells]]. */
  def assignPq(sv: DataFrame, books: DataFrame): DataFrame =
    sv.join(broadcast(books), "sub")
      .withColumn("d2", aggregate(
        zip_with(col("subvec"), col("centroid"), (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v))
      .groupBy("vec_id", "sub")
      .agg(
        min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
        first(col("subvec")).as("subvec"))

  /** (vec_id, sub, code): the compressed corpus — m small ints per vector.
    * Takes the same (ideally checkpointed) subvector frame as training. */
  def pqEncode(sv: DataFrame, books: DataFrame): DataFrame =
    assignPq(sv, books)
      .select(col("vec_id"), col("sub"), col("cell").as("code"))
}
