package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase (salted) aggregation. A hot grouping key that
  * would funnel into one reducer is split across `buckets` salted sub-keys
  * for the partial phase; the final phase merges the per-salt partials — the
  * shuffle for phase 1 spreads the hot key over `buckets` tasks, and phase 2
  * moves only one row per (key, salt).
  *
  * The salt derives from a caller-supplied deterministic column (a row id),
  * not rand(), so results are reproducible and oracle-checkable — salting is
  * semantically transparent for decomposable aggregates.
  *
  * (AQE's skew-join handling covers joins; this is the groupBy-side
  * equivalent for extreme single-key hot spots at the 100 TB design point.)
  */
object Skew {

  /** Salted decomposable aggregation: sums/counts of `aggs` per `key`.
    * `uniq` must be deterministic per row (e.g. a primary key expression).
    */
  def saltedAgg(
      df: DataFrame,
      key: Seq[String],
      uniq: Column,
      buckets: Int)(
      aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(uniq), lit(buckets)))
    val partial = salted
      .groupBy((key :+ "_salt").map(col): _*)
      .agg(aggs.head._2.as(s"_p_${aggs.head._1}"),
        aggs.tail.map { case (n, c) => c.as(s"_p_$n") }: _*)
    partial
      .groupBy(key.map(col): _*)
      .agg(sum(col(s"_p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(s"_p_$n")).as(n) }: _*)
  }
}
