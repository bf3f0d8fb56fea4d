package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the adaptive probe-radius contract of VectorQueries.probesOf: the
  * fan-out is 1 + bits below Radius2Bits (exact bucket + every Hamming-1
  * flip) and 1 + bits + C(bits,2) at or above it (+ every Hamming-2 flip),
  * with every probed bucket at the declared Hamming distance. The recall
  * consequences are asserted end-to-end in KnnGraphSpec (sf0.001) and
  * recorded at ×5 in BENCH_scale's knn_recall_x5; this spec guards the
  * mechanism itself so a probe regression fails here first.
  */
class ProbeRadiusSpec extends SparkSpec {
  import spark.implicits._

  private def probes(bits: Int): Seq[Long] = {
    val one = Seq((1L, 0, 0L)).toDF("vec_id", "tbl", "bucket")
    VectorQueries.probesOf(one, bits).select("bucket")
      .collect().map(_.getLong(0)).toSeq
  }

  test("below Radius2Bits: exact bucket + all Hamming-1 flips, nothing else") {
    val bits = VectorQueries.Radius2Bits - 1
    val got = probes(bits)
    assert(got.size == 1 + bits)
    assert(got.distinct.size == got.size)
    assert(got.forall(b => java.lang.Long.bitCount(b) <= 1),
      "every probe of bucket 0 must be within Hamming distance 1")
    assert(got.count(b => java.lang.Long.bitCount(b) == 1) == bits)
  }

  test("at Radius2Bits and above: Hamming-2 flips join the probe set") {
    val bits = VectorQueries.Radius2Bits
    val got = probes(bits)
    assert(got.size == 1 + bits + bits * (bits - 1) / 2)
    assert(got.distinct.size == got.size)
    assert(got.forall(b => java.lang.Long.bitCount(b) <= 2))
    assert(got.count(b => java.lang.Long.bitCount(b) == 2) == bits * (bits - 1) / 2)
  }
}
