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

  /** Salted decomposable aggregation of `aggs` per `key`.
    * `uniq` must be deterministic per row (e.g. a primary key expression).
    *
    * Each agg must be a BARE sum/count/min/max — the merge phase is chosen
    * from the analyzed partial plan (sum/count merge by sum, min by min, max
    * by max); anything else (avg, wrapped expressions like sum(x)+1) cannot
    * be reassembled from per-salt partials and is rejected with
    * IllegalArgumentException rather than silently mis-merged.
    */
  def saltedAgg(
      df: DataFrame,
      key: Seq[String],
      uniq: Column,
      buckets: Int)(
      aggs: (String, Column)*): DataFrame = {
    require(buckets > 0, s"saltedAgg: buckets must be positive, got $buckets")
    val salted = df.withColumn("_salt", pmod(hash(uniq), lit(buckets)))
    val partial = salted
      .groupBy((key :+ "_salt").map(col): _*)
      .agg(aggs.head._2.as(s"_p_${aggs.head._1}"),
        aggs.tail.map { case (n, c) => c.as(s"_p_$n") }: _*)
    val mergeOps = mergeOpsFor(partial)
    partial
      .groupBy(key.map(col): _*)
      .agg(mergeOps(aggs.head._1)(col(s"_p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _) => mergeOps(n)(col(s"_p_$n")).as(n) }: _*)
  }

  /** Decomposability gate: map each `_p_`-aliased output of the analyzed
    * partial Aggregate to its salt-merge operator.
    */
  private def mergeOpsFor(partial: DataFrame): Map[String, Column => Column] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    partial.queryExecution.analyzed match {
      case agg: Aggregate =>
        agg.aggregateExpressions.collect {
          case a @ Alias(child, name) if name.startsWith("_p_") =>
            val merge: Column => Column = child match {
              // DISTINCT never decomposes over salts: hash(salt source)
              // scatters equal values across buckets, each bucket counts
              // them once, and the sum-merge multiple-counts
              case ae: AggregateExpression if ae.isDistinct =>
                throw new IllegalArgumentException(
                  s"saltedAgg: '${name.stripPrefix("_p_")}' is DISTINCT — " +
                    "distinct aggregates do not merge across salt buckets")
              case ae: AggregateExpression => ae.aggregateFunction match {
                case _: Sum | _: Count => sum(_)
                case _: Min            => min(_)
                case _: Max            => max(_)
                case f => throw new IllegalArgumentException(
                  s"saltedAgg: '${name.stripPrefix("_p_")}' uses ${f.prettyName}, " +
                    "which does not merge across salt buckets — only bare " +
                    "sum/count/min/max are decomposable")
              }
              case e => throw new IllegalArgumentException(
                s"saltedAgg: '${name.stripPrefix("_p_")}' is not a bare aggregate " +
                  s"(${e.sql}) — wrapped expressions do not merge across salts")
            }
            name.stripPrefix("_p_") -> merge
        }.toMap
      case other => throw new IllegalStateException(
        s"saltedAgg: expected an Aggregate partial plan, got ${other.nodeName}")
    }
  }
}
