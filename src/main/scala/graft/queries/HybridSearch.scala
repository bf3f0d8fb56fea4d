package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval over the PERSISTED index stores,
  * fused by Reciprocal Rank Fusion (Cormack et al., SIGIR'09:
  * score = Σ 1/(60+rank)) — the serving composition of
  * [[InvertedIndex.idfTopK]] (pruned posting buckets) and
  * [[IndexedLayout.prunedTopK]] (pruned cells). The q_hybrid_rrf catalog
  * row computes the same fusion from direct corpus scans; the
  * q_hybrid_rrf_idx row proves THIS path answers identically
  * (oracle-exact against the literal same SQL when nprobe covers every
  * cell), and HybridFreshnessE2eSpec proves both sync loops' CDC reaches
  * this surface.
  */
object HybridSearch {

  /** RRF-fuse two k-bounded rank lists — `lex` (q_id, doc_id, lrank) and
    * `vec` (q_id, doc_id, vrank) — into the top-`k` per query. Fusion
    * touches only the two rank lists (full outer on (q, doc), ≤ 2k rows
    * per query); every rank is an integer and the RRF sum a fixed-order
    * two-term double, so the result is deterministic across engines and
    * partitionings (ties → lowest doc_id).
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val wf = Window.partitionBy("q_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)), 6))
      .withColumn("rnk", row_number().over(wf))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "doc_id", "rrf")
      .orderBy("q_id", "rnk")
  }

  /** Top-`k` hybrid results per query from the two physical stores:
    * `textQueries` is (q_id, text) for the lexical side, `embQueries`
    * (q_id, q_emb) for the vector side (the same q_id keys — documents
    * and embeddings align by id in this corpus), `shortK` the per-side
    * rank-list depth, `nprobe` the vector side's cell budget. Both sides
    * prune at planning time; fusion is rank-list-sized.
    */
  def fromIndexes(spark: SparkSession, lexDir: String, vecDir: String,
      textQueries: DataFrame, embQueries: DataFrame, k: Int,
      shortK: Int, nprobe: Int,
      excludeQueryDoc: Boolean = false): DataFrame = {
    val lex = InvertedIndex.idfTopK(spark, lexDir, textQueries,
        k = shortK, excludeQueryDoc = excludeQueryDoc)
      .select(col("q_id"), col("doc_id"), col("rnk").as("lrank"))
    val vec = IndexedLayout.prunedTopK(spark, vecDir, embQueries,
        k = shortK, nprobe = nprobe)
      .select(col("q_id"), col("vec_id").as("doc_id"),
        col("rnk").as("vrank"))
    rrfFuse(lex, vec, k)
  }
}
