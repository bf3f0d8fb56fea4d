package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min heavy hitters — the sketch path for "which tokens dominate the
  * corpus" when exact per-key counts don't fit: a fixed-width sketch merges
  * associatively across partitions (one small binary through the exchange
  * instead of a vocabulary-sized shuffle). Count-min guarantees
  * estimate >= truth and, with eps/confidence (w = ceil(2/eps)), overshoot
  * <= eps·N with probability >= confidence — both bounds asserted against
  * exact counts.
  */
class HeavyHittersSpec extends SparkSpec {
  import graft.functions.TextFunctions.tokens

  test("count_min_sketch bounds hold vs exact token counts") {
    val eps = 0.01
    val toks = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(tokens(col("text"))).as("tok"))
    val skBytes = toks.agg(
        expr(s"count_min_sketch(tok, CAST($eps AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head.getAs[Array[Byte]](0)
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(skBytes))
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(sk.totalCount() == n)
    val overshoots = exact.map { case (tok, truth) =>
      val est = sk.estimateCount(tok)
      assert(est >= truth, s"count-min underestimated '$tok': $est < $truth")
      est - truth
    }
    // eps-bound: overshoot <= eps * N for (at least) the vast majority of
    // keys; with this sketch width the fixture should satisfy it for all
    val bound = (eps * n).toLong
    val violating = overshoots.count(_ > bound)
    assert(violating == 0, s"$violating tokens overshoot eps*N = $bound")
    // and the top exact heavy hitter is also the top estimated one
    val topExact = exact.maxBy(_._2)._1
    val topEst = exact.keys.maxBy(sk.estimateCount(_))
    assert(topEst == topExact)
  }
}
