package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime answer to a hot key that salting
  * (Skew.saltedAgg) answers statically: a partition carrying ~90% of the
  * join's rows gets split into advisory-sized chunks at execution time, so
  * one straggler task stops gating the stage. Thresholds are lowered here
  * so the mechanism triggers at test scale; at 100 TB the defaults (256 MB
  * threshold, 5× median factor) do the same job.
  */
class AqeSkewSpec extends SparkSpec {

  test("a hot join key is split by AQE (skew=true in the final plan), result exact") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows land on key 0; right is 1 row per key (not
      // broadcastable with the threshold off)
      val left = spark.range(0, 200000)
        .select(when(col("id") < 180000, 0L).otherwise(col("id") % 50 + 1).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 51).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's QueryExecution (count() would plan
      // its own), so the adaptive plan below is the executed, final one
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(1000))
      assert(plan.contains("skew=true"), plan.take(4000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
