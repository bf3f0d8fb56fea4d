package graft.queries

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GRAPH-TRAVERSAL ANN search — the HNSW/DiskANN-family serving path over
  * the engine's persisted k-NN graph ([[KnnGraphBuild]]): queries walk
  * the neighborhood structure instead of scanning cells, so per-query
  * cost is beam × degree × iters candidate scorings, INDEPENDENT of
  * corpus size — the third search regime beside the brute broadcast scan
  * (q_sim_topk) and the IVF pruned scan (prunedTopK).
  *
  * The walk is the standard greedy beam search, batched across queries
  * as dataframe rounds (the Pregel shape again): the current beam joins
  * the adjacency on the vertex key, NEW candidates (anti-join against
  * the already-scored set) get scored against their query, and the
  * top-`beam` survivors per query form the next frontier. Scores are
  * computed ONCE per (query, vertex) — the scored set is carried, never
  * recomputed. Entry points are the `entrySeeds` lowest vec_ids
  * (deterministic; on a navigable graph any spread set works, and ids
  * carry no geometry). The graph is made UNDIRECTED for navigability
  * (k-NN edges alone are poorly navigable out-of-neighborhood; the
  * reverse edges are the cheap half of HNSW's bidirectional linking).
  *
  * Determinism: ranking keys are (round(cos, 6) desc, vec_id) at every
  * stage, so the walk — and therefore the result — is reproducible
  * across runs and partitionings. Approximate by construction (the walk
  * can only find vertices connected to the seeds); recall floors are
  * measured and asserted in GraphSearchSpec, the rows-only contract of
  * the other ANN sketches.
  */
object GraphSearch {

  /** Beam-search top-`k` over a RANKED adjacency frame (the
    * (q_id, rnk, vec_id, cos) shape of [[KnnGraphBuild.readGraph]] /
    * the q_sim_knn_graph pipeline). `embeddings` supplies the vectors to
    * score; `queries` is (q_id, q_emb), broadcast-contract small.
    */
  def beamTopK(spark: SparkSession, rankedGraph: DataFrame,
      embeddings: DataFrame, queries: DataFrame, k: Int,
      beam: Int = 32, iters: Int = 4, entrySeeds: Int = 16): DataFrame = {
    val adj = rankedGraph
      .select(col("q_id").as("src"), col("vec_id").as("dst"))
      .unionByName(rankedGraph
        .select(col("vec_id").as("src"), col("q_id").as("dst")))
      .distinct().localCheckpoint() // consumed every round
    val e = VectorQueries.nrmFrame(embeddings.select("vec_id", "embedding"))
      .localCheckpoint()
    val q = broadcast(queries
      .select(col("q_id"), col("q_emb"), l2Norm(col("q_emb")).as("q_n")))
    def score(cand: DataFrame): DataFrame = // (q_id, vec_id) → + cos_r
      cand.join(e, "vec_id").join(q, "q_id")
        .withColumn("cos_r", round(cosineWithNorms(
          col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
        .select("q_id", "vec_id", "cos_r")
    val wBeam = Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    def topBeam(scored: DataFrame): DataFrame = scored
      .withColumn("__r", row_number().over(wBeam))
      .filter(col("__r") <= beam).drop("__r")
    // all queries start at the same deterministic seed set
    val seeds = e.orderBy("vec_id").limit(entrySeeds).select("vec_id")
    var scoredAll = score(q.select("q_id").crossJoin(seeds))
      .localCheckpoint() // every (q, v) ever scored — dedup authority
    var frontier = topBeam(scoredAll).localCheckpoint()
    for (_ <- 1 to iters) {
      val fresh = frontier.select("q_id", "vec_id")
        .join(adj, col("vec_id") === col("src"))
        .select(col("q_id"), col("dst").as("vec_id"))
        .distinct()
        .join(scoredAll.select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_anti") // score once per (q, v)
      scoredAll = scoredAll.unionByName(score(fresh)).localCheckpoint()
      frontier = topBeam(scoredAll).localCheckpoint()
    }
    frontier.filter(col("q_id") =!= col("vec_id"))
      .withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        graft.Canon.r4(col("cos_r")).as("cos"))
      .orderBy("q_id", "rnk")
  }

  /** The persisted-graph form: search [[KnnGraphBuild]] state on disk —
    * the serving call of the IndexSync-maintained graph.
    */
  def beamTopK(spark: SparkSession, graphDir: String,
      embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame =
    beamTopK(spark, KnnGraphBuild.readGraph(spark, graphDir),
      embeddings, queries, k)
}
