package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: weighted average with exact-decimal accumulation so the
  * partial-merge order (Spark's map-side combine) cannot perturb the result
  * — required for hash-parity with a sequential oracle.
  *
  * Registered via `functions.udaf(WeightedAvg)`; input is (value, weight).
  */
object WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
  private def dec6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  private def dec4(x: Double): BigDecimal =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + dec6(a._1 * a._2), b._2 + dec4(a._2))

  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._2 == BigDecimal(0)) 0.0 else b._1.toDouble / b._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
