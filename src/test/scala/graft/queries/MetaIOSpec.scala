package graft.queries

import graft.SparkSpec

/** The driver-side meta reader/writer must stay format-compatible in BOTH
  * directions with the Spark path it replaced: rows Spark wrote read back
  * identically (old stores on disk keep working), and rows MetaIO writes
  * are plain parquet Spark reads back identically (tests and external
  * tools that `spark.read.parquet` a meta dir keep working).
  */
class MetaIOSpec extends SparkSpec {

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  test("reads a Spark-written meta row (old-store compatibility)") {
    import spark.implicits._
    val d = tmp("metaio_sparkwritten")
    Seq((3, 7L, "ivf", Seq("k1", "k2"), Seq(0.5, 1.5), Seq.empty[Double]))
      .toDF("epoch", "hwm", "method", "keys", "splits", "empty")
      .coalesce(1).write.mode("overwrite").parquet(d)
    val r = MetaIO.readHead(spark, d)
    assert(r.getInt("epoch") == 3)
    assert(r.getLong("hwm") == 7L)
    assert(r.getLong("epoch") == 3L) // Int column read as Long (old getAs[Long] sites)
    assert(r.getString("method") == "ivf")
    assert(r.getStringSeq("keys") == Seq("k1", "k2"))
    assert(r.getDoubleSeq("splits") == Seq(0.5, 1.5))
    assert(r.getDoubleSeq("empty").isEmpty)
    assert(r.has("method") && !r.has("nope"))
  }

  test("a MetaIO-written row reads back via MetaIO and via spark.read") {
    val d = tmp("metaio_roundtrip")
    MetaIO.writeRow(spark, d, "epoch" -> 5, "hwm" -> 42L,
      "method" -> "lsh", "keys" -> MetaIO.Strs(Seq("a")),
      "splits" -> MetaIO.Dbls(Seq(1.25, -2.5)),
      "none" -> MetaIO.Dbls(Seq.empty))
    val r = MetaIO.readHead(spark, d)
    assert(r.getInt("epoch") == 5 && r.getLong("hwm") == 42L &&
      r.getString("method") == "lsh" &&
      r.getStringSeq("keys") == Seq("a") &&
      r.getDoubleSeq("splits") == Seq(1.25, -2.5) &&
      r.getDoubleSeq("none").isEmpty)
    val row = spark.read.parquet(d).head
    assert(row.getAs[Int]("epoch") == 5)
    assert(row.getAs[Long]("hwm") == 42L)
    assert(row.getAs[String]("method") == "lsh")
    assert(row.getSeq[String](row.fieldIndex("keys")) == Seq("a"))
    assert(row.getSeq[Double](row.fieldIndex("splits")) == Seq(1.25, -2.5))
    assert(row.getSeq[Double](row.fieldIndex("none")).isEmpty)
  }

  test("writeRow overwrites a previous epoch record in place") {
    val d = tmp("metaio_overwrite")
    MetaIO.writeRow(spark, d, "epoch" -> 1)
    MetaIO.writeRow(spark, d, "epoch" -> 2, "extra" -> 9L)
    val r = MetaIO.readHead(spark, d)
    assert(r.getInt("epoch") == 2 && r.getLong("extra") == 9L)
    assert(spark.read.parquet(d).count() == 1)
  }
}
