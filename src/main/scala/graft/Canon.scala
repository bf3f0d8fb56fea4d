package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Canonicalization helpers so Spark results hash-match the DuckDB oracle.
  *
  * The two hazards when diffing float results across engines are (a)
  * aggregation order — parallel double sums are order-dependent, DuckDB's
  * are sequential — and (b) rounding-mode differences. We neutralize (a) by
  * summing in exact decimal (inputs have ≤4 meaningful decimal digits, so
  * the cast is lossless-after-rounding and both engines land on the same
  * decimal), then casting back to double. (b) is a non-issue for round():
  * non-dyadic decimal midpoints are not representable as binary doubles, so
  * HALF_UP vs HALF_EVEN never actually disagree on real data.
  */
object Canon {
  /** Order-independent exact SUM for money-ish doubles (≤4 decimals). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Same, keeping 6 decimals (per-row products of two 2-decimal values). */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Order-independent AVG: exact decimal sum, then one double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  def r4(c: Column): Column = round(c, 4)

  /** Timestamps go to the oracle as second-precision strings: the events
    * table is ns in parquet but us in Spark, so raw timestamp values would
    * never hash-match.
    */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** DuckDB equivalents, for composing oracle SQL. */
  object sql {
    def dsum(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(28,4))) AS DOUBLE)"
    def dsum6(c: String): String = s"CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE)"
    def davg(c: String): String = s"(${dsum(c)} / COUNT($c))"
    def fmtTs(c: String): String = s"strftime($c, '%Y-%m-%d %H:%M:%S')"
  }
}
