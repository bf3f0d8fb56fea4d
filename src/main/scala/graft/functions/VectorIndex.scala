package graft.functions

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index construction: a k-means centroid table (the coarse quantizer)
  * plus cell assignments, so similarity search scans one cell instead of the
  * corpus — the 100 TB scale path SURVEY.md §2.B-LLM sketches, where the
  * corpus is partitioned/bucketed by cell.
  *
  * Lloyd's algorithm, Spark-shaped and deterministic:
  *   - init: the first k vectors by vec_id (no RNG)
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

  /** (cell INT, centroid ARRAY<DOUBLE>) after `iters` Lloyd iterations. */
  def kmeansCentroids(
      spark: SparkSession,
      embeddings: DataFrame, // (vec_id LONG, embedding ARRAY<FLOAT>)
      k: Int,
      iters: Int): DataFrame = {
    import spark.implicits._
    var centroids = embeddings
      .orderBy("vec_id").limit(k)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).as("cell"),
        col("embedding").cast("array<double>").as("centroid"))
    (0 until iters).foreach { _ =>
      val assigned = assignCells(embeddings, centroids)
      val updated = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(avg(col("v")).as("c"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("entries"))
        .select(col("cell"),
          expr("transform(entries, e -> e.c)").as("centroid"))
      // truncate lineage: each Lloyd iteration would otherwise recompute all
      // prior iterations per action; the centroid table is k·dim doubles, so
      // collect it and restart the plan from a literal dataset. A cell with
      // zero members produces no update row — keep its previous centroid
      // rather than letting k silently shrink.
      val updatedMap = updated.as[(Int, Seq[Double])].collect().toMap
      val prevMap = centroids.as[(Int, Seq[Double])].collect().toMap
      val rows = (0 until k).map(c => (c, updatedMap.getOrElse(c, prevMap(c))))
      centroids = rows.toDF("cell", "centroid")
    }
    centroids
  }

  /** Tag each vector with its nearest (max-cosine) cell; ties → lowest id.
    * Centroids are broadcast; the argmax is a partial+final max_by
    * aggregation, so the exchange carries one pre-combined row per vector —
    * not the corpus×k rows a window-over-vec_id would shuffle.
    */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    embeddings.crossJoin(broadcast(centroids))
      .withColumn("sim",
        cosineSimilarity(col("embedding").cast("array<double>"), col("centroid")))
      .groupBy("vec_id")
      .agg(
        max_by(col("cell"), struct(col("sim"), -col("cell"))).as("cell"),
        first(col("embedding")).as("embedding")) // identical across the k copies
}
