package graft

import org.apache.spark.sql.{DataFrame, Row}

/** THE recall computation — the single code path behind both the
  * QualityChecksSpec/KnnGraphSpec floors and the graft.RecallProbe
  * measurement loop (VERDICT r6 item 7: one implementation, so a refactor
  * of the probe cannot silently diverge from what the floors assert).
  *
  * Works over the catalog's common ANN result shape:
  * (q_id BIGINT, rnk INT, vec_id BIGINT, ...).
  */
object Recall {

  /** The (q_id, vec_id) edge set of a ranked result, cut at `maxRnk` —
    * one exact run serves several cut-offs (rnk<=3 is a filter of rnk<=5).
    */
  def pairs(rows: Array[Row], maxRnk: Int): Set[(Long, Long)] =
    rows.filter(_.getAs[Int]("rnk") <= maxRnk)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
      .toSet

  /** Fraction of the exact edge set the approximate result recovered. */
  def of(exact: Set[(Long, Long)], got: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size

  /** recall@k of an approximate result DataFrame vs an exact one. */
  def at(exact: DataFrame, approx: DataFrame, k: Int): Double =
    of(pairs(exact.collect(), k), pairs(approx.collect(), k))
}
