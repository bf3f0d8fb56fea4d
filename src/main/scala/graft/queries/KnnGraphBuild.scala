package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained k-NN graph — the vector-side dual of
  * [[CorpusBuild]]'s delta mode: as the embedded corpus grows (VectorSync
  * upserts, CorpusBuild deltas), the neighbor graph behind SemDeDup /
  * embedding near-dup must grow WITH it, and rebuilding an n-vector graph
  * to absorb an m-vector delta (m ≪ n) re-scores the n² interior for
  * nothing.
  *
  * [[build]] writes `outDir/graph` (the q_sim_knn_graph row shape) plus the
  * working state under `outDir/_graft_state/`: the signature frame (`sigs`:
  * vec_id, embedding, nrm, sigs), the k-bounded DIRECTED edge list
  * (`edges`: a_id, b_id, cos_r at merge precision) and `meta` (bits,
  * tables, k, max vec_id).
  *
  * [[delta]] takes ONLY the new vectors. New-vs-new candidates come from
  * the usual bucket self-join; new-vs-old candidates from probing the new
  * signatures into the STORED buckets (the Hamming-1 condition is
  * symmetric, so probing the delta side covers every cross pair). Old-old
  * pairs are never re-scored: the stored top-k edge list already dominates
  * them — an edge outside a vertex's stored top-k is beaten by k edges that
  * are still present, so merging (stored edges ∪ new directed edges)
  * through the same TopKPerKey is EXACTLY the full rebuild's answer. That
  * exactness (not recall-approximate — row-identical) holds because the
  * hyperplane signatures are deterministic in (bits, tables), which the
  * state pins; KnnGraphBuildSpec asserts delta ≡ full rebuild bit-for-bit.
  *
  * Append-only contract and delivery are as in [[CorpusBuild]]: delta
  * vec_ids must exceed the stored high-water mark (validated loudly), and
  * the mark is written FIRST so a crashed delta fails closed on retry.
  * The graph/edge rewrite is O(n·k) per delta — at the 100 TB design point
  * the same merge runs as append-delta-shards + TopKPerKey compaction on
  * read, trading write amplification for a read-side merge; the scoring
  * scale shape (no old-old re-score) is identical either way.
  */
object KnnGraphBuild {

  private def stateDir(outDir: String) = s"$outDir/_graft_state"

  final case class Meta(bits: Int, tables: Int, k: Int, maxVecId: Long)

  /** Full build over an embedding frame (vec_id, embedding). */
  def build(spark: SparkSession, embeddings: DataFrame, outDir: String,
      k: Int = 5, tables: Int = 8, bitsOverride: Int = 0): Long = {
    val e = embeddings.select("vec_id", "embedding")
    val bits =
      if (bitsOverride > 0) bitsOverride
      else VectorQueries.adaptiveBits(e.count())
    val sigs = VectorQueries.sigFrame(e, bits, tables).localCheckpoint()
    val buckets = VectorQueries.bucketsOf(sigs)
    val cand = VectorQueries.selfCandidates(buckets, bits)
    val edges = VectorQueries.topKEdges(
      VectorQueries.scorePairs(cand, sigs, sigs), k).localCheckpoint()
    writeAll(spark, sigs, edges, Meta(bits, tables, k, maxId(sigs)), outDir,
      append = false)
    edges.count()
  }

  /** Incremental build: absorb `newVecs` without re-scoring old-old pairs.
    * No-op on an empty delta. Returns the merged directed edge count.
    */
  def delta(spark: SparkSession, newVecs: DataFrame, outDir: String): Long = {
    val st = stateDir(outDir)
    val meta = readMeta(spark, st)
    val e = newVecs.select("vec_id", "embedding")
    val minRow = e.agg(min("vec_id")).head
    if (minRow.isNullAt(0))
      return spark.read.parquet(s"$st/edges").count() // empty delta: no-op
    require(minRow.getLong(0) > meta.maxVecId,
      s"delta vec_ids must sort after every id the build has seen " +
        s"(append-only contract): new min ${minRow.getLong(0)} <= stored " +
        s"max ${meta.maxVecId}")
    // the STORED signature function — adaptive sizing would change the
    // signatures and break both exactness and the stored buckets
    val oldSigs = spark.read.parquet(s"$st/sigs").localCheckpoint()
    val newSigs = VectorQueries.sigFrame(e, meta.bits, meta.tables)
      .localCheckpoint()
    val newBuckets = VectorQueries.bucketsOf(newSigs)
    val oldBuckets = VectorQueries.bucketsOf(oldSigs)
    val newNew = VectorQueries.selfCandidates(newBuckets, meta.bits)
    // cross pairs oriented (a = old, b = new) — a<b holds by the id
    // contract, matching the self-join's orientation
    val cross = VectorQueries.probesOf(newBuckets, meta.bits).as("bn")
      .join(oldBuckets.as("bo"),
        col("bn.tbl") === col("bo.tbl") && col("bn.bucket") === col("bo.bucket"))
      .select(col("bo.vec_id").as("a_id"), col("bn.vec_id").as("b_id"))
      .distinct()
    val scored = VectorQueries.scorePairs(newNew, newSigs, newSigs)
      .union(VectorQueries.scorePairs(cross, oldSigs, newSigs))
    val newEdges = VectorQueries.topKEdges(scored, meta.k)
    val prevEdges = spark.read.parquet(s"$st/edges")
    // stored edges are already directed (a_id = query vertex), so only the
    // final heap runs here — then materialize BEFORE overwriting the
    // directory the plan reads from
    val merged = graft.plans.TopKPerKey(prevEdges.union(newEdges),
      Seq(col("a_id")), Seq(col("cos_r").desc, col("b_id").asc), meta.k)
      .localCheckpoint()
    writeAll(spark, newSigs, merged,
      meta.copy(maxVecId = math.max(meta.maxVecId, maxId(newSigs))), outDir,
      append = true)
    merged.count()
  }

  /** The graph in the q_sim_knn_graph row shape, from the stored edges. */
  def readGraph(spark: SparkSession, outDir: String): DataFrame =
    VectorQueries.rankGraph(spark.read.parquet(s"${stateDir(outDir)}/edges"))

  private def maxId(sigs: DataFrame): Long = {
    val r = sigs.agg(max("vec_id")).head
    if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
  }

  /** Delta writes the high-water mark FIRST (fail closed on retry, as in
    * CorpusBuild); a full build overwrites the graph dir and writes state
    * after.
    */
  private def writeAll(spark: SparkSession, sigs: DataFrame, edges: DataFrame,
      meta: Meta, outDir: String, append: Boolean): Unit = {
    import spark.implicits._
    val st = stateDir(outDir)
    def writeMeta(): Unit =
      Seq((meta.bits, meta.tables, meta.k, meta.maxVecId))
        .toDF("bits", "tables", "k", "max_vec_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$st/meta")
    if (append) writeMeta()
    // edges are the merge state AND the source of the readable graph; the
    // ranked form is derived on read (rankGraph), so the output can never
    // drift from the state
    edges.write.mode("overwrite").parquet(s"$st/edges")
    sigs.write.mode(if (append) "append" else "overwrite").parquet(s"$st/sigs")
    if (!append) writeMeta()
  }

  private def readMeta(spark: SparkSession, st: String): Meta = {
    val r = spark.read.parquet(s"$st/meta").head
    Meta(r.getAs[Int]("bits"), r.getAs[Int]("tables"), r.getAs[Int]("k"),
      r.getAs[Long]("max_vec_id"))
  }
}
