package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — at 100 TB the probe side of a
  * selective join should not shuffle rows the build side will discard:
  * Catalyst's InjectRuntimeFilter plants a bloom_filter_agg subquery on the
  * filtered (build) side and a bloom_filter_might_contain predicate on the
  * probe side's scan, so non-joining rows die before the exchange. The
  * size thresholds guarding the rule are cluster-scale (probe > 10 GB);
  * this spec lowers them to prove the MECHANISM end-to-end on the fixture
  * — the plan grows the might_contain filter and the result is unchanged.
  */
class BloomJoinSpec extends SparkSpec {

  test("a selective build side injects a bloom filter on the probe scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the 10 GB probe-size guard is a cluster-scale economics knob, not a
      // correctness one — drop it so the fixture-size probe qualifies
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val ord = spark.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_totalprice")
      val li = spark.read.parquet(s"$sf001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val n = q.collect().length
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("might_contain"),
        s"no bloom filter on the probe side:\n$phys")
      // pruning must not change the answer
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(plain.collect().length == n)
      assert(!plain.queryExecution.executedPlan.toString.contains("might_contain"))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
