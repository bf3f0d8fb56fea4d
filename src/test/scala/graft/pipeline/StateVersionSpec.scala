package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The checkpoint state-version stamp (VERDICT r7 item 8): COVERAGE.md
  * freezes `Debounce.Pending`'s shape as of round 7 — this encodes the
  * freeze as code. A mismatched checkpoint must die at START with an
  * actionable message, not as Spark's opaque state-schema error mid-batch.
  */
class StateVersionSpec extends SparkSpec {

  test("first start stamps; matching restart passes; mismatch fails loudly") {
    val dir = Files.createTempDirectory("ckpt-ver").toString
    SyncPipeline.stampStateVersion(spark, dir)
    val stamp = new java.io.File(dir, "_graft_state_version")
    assert(stamp.isFile)
    assert(scala.io.Source.fromFile(stamp).mkString.trim ==
      SyncPipeline.StateVersion.toString)

    // same version: idempotent
    SyncPipeline.stampStateVersion(spark, dir)

    // a checkpoint from a different (hypothetical) shape version — drop the
    // Hadoop local-FS checksum sidecar, since we rewrite via raw NIO
    new java.io.File(dir, "._graft_state_version.crc").delete()
    Files.write(stamp.toPath, "999\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      SyncPipeline.stampStateVersion(spark, dir)
    }
    assert(e.getMessage.contains("state version 999"))
    assert(e.getMessage.contains("fresh checkpointLocation"))
  }

  test("pipeline start refuses a mismatched checkpoint before running a batch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[ResourceEventRow] =
      org.apache.spark.sql.Encoders.product[ResourceEventRow]
    val dir = Files.createTempDirectory("ckpt-ver-e2e").toString
    Files.write(new java.io.File(dir, "_graft_state_version").toPath,
      "0\n".getBytes("UTF-8"))
    val sink = new RestSink(post = _ => 200, sleep = _ => (), jitter = () => 1.0)
    val source = MemoryStream[ResourceEventRow]
    val e = intercept[IllegalArgumentException] {
      SyncPipeline.start(source.toDS(), sink,
        SyncPipeline.Config(flushIntervalMs = 100, checkpointDir = dir))
    }
    assert(e.getMessage.contains("state version 0"))
  }
}
