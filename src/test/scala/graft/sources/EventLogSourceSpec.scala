package graft.sources

import graft.SparkSpec
import graft.pipeline.ResourceEventRow
import java.sql.Timestamp
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 event-log source vs the built-in json reader: identical rows,
  * pruning reaches the parser, accepted predicates leave no residual
  * Filter in the plan.
  */
class EventLogSourceSpec extends SparkSpec {

  private val fmt = "graft.sources.EventLogSource"

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2").toString
    val rows = (1 to 40).map { i =>
      ResourceEventRow(
        if (i % 7 == 0) "DELETE" else "ADD", i.toLong,
        new Timestamp(i * 1000L),
        s"ns$i/apps/v1/Deployment/app-$i", s"ns${i % 3}", s"app-$i",
        if (i % 2 == 0) "Deployment" else "ConfigMap", "apps/v1", "apps",
        Map("i" -> i.toString, "parity" -> (i % 2).toString),
        if (i % 5 == 0) null else Map("note" -> s"n$i"),
        new Timestamp(i * 500L))
    }
    rows.toDS().coalesce(2).write.mode("overwrite").json(d)
    // the source lists *.json; Spark writes part-*.json files
    d
  }

  private def viaJson = {
    import org.apache.spark.sql.Encoders
    spark.read.schema(Encoders.product[ResourceEventRow].schema).json(dir)
  }

  test("round-trips every row and column identically to the json reader") {
    val a = spark.read.format(fmt).load(dir)
      .orderBy("event_seq").collect().map(_.toSeq).toSeq
    val b = viaJson.orderBy("event_seq").collect().map(_.toSeq).toSeq
    assert(a.size == 40)
    assert(a == b)
  }

  test("column pruning reaches the scan's read schema") {
    val df = spark.read.format(fmt).load(dir).select("kind", "event_seq")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSet == Set("kind", "event_seq"), scans.head)
  }

  test("equality and IN predicates push into the scan with no residual Filter") {
    val df = spark.read.format(fmt).load(dir)
      .filter(col("event_type") === "DELETE" && col("kind").isin("Deployment", "ConfigMap"))
      .select("event_seq")
    val plan = df.queryExecution.executedPlan
    val pushed = plan.collect { case b: BatchScanExec =>
      b.scan.asInstanceOf[EventLogScan].pushed
    }.head
    assert(pushed.nonEmpty, "nothing pushed")
    val residualFilters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residualFilters.isEmpty, plan.toString)
    val seqs = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == (1 to 40).filter(_ % 7 == 0).map(_.toLong))
  }

  test("unknown predicate types stay post-scan and results are still exact") {
    val df = spark.read.format(fmt).load(dir).filter(col("event_seq") > 30)
    assert(df.count() == 10) // GreaterThan on a long: rejected, filtered above
  }

  test("streams the log with file-count offsets, only new files per micro-batch") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_stream").toString
    def writeFile(name: String, seqs: Range): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, name),
        seqs.map(i =>
          s"""{"event_type":"ADD","event_seq":$i,"ts":"2020-01-01T00:00:0${i % 10}.000Z","id":"x/$i","namespace":"ns","name":"n$i","kind":"Deployment","apiVersion":"apps/v1","apiGroup":"apps","labels":{"i":"$i"},"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}""")
          .mkString("\n"))
    writeFile("a.json", 1 to 3)
    val q = spark.readStream.format(fmt).load(d)
      .select("event_seq")
      .writeStream.format("memory").queryName("dsv2_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dsv2_stream").head.getLong(0) == 3)
      writeFile("b.json", 4 to 9) // arrives later, sorts after a.json
      q.processAllAvailable()
      val seqs = spark.sql("SELECT event_seq FROM dsv2_stream ORDER BY event_seq")
        .collect().map(_.getLong(0)).toSeq
      assert(seqs == (1L to 9L)) // each file consumed exactly once
    } finally { q.stop(); spark.catalog.dropTempView("dsv2_stream") }
  }

  test("a restarted stream resumes from the checkpointed file-count offset") {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_restart").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dsv2_restart_ckpt").toString
    def writeFile(name: String, seqs: Range): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, name),
        seqs.map(i =>
          s"""{"event_type":"ADD","event_seq":$i,"ts":"2020-01-01T00:00:00.000Z","id":"x/$i","namespace":"ns","name":"n$i","kind":"D","apiVersion":"apps/v1","apiGroup":"apps","labels":null,"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}""")
          .mkString("\n"))
    val sink = java.nio.file.Files.createTempDirectory("graft_dsv2_restart_out").toString
    def start() = spark.readStream.format(fmt).load(d)
      .select("event_seq")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    writeFile("a.json", 1 to 4)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    writeFile("b.json", 5 to 7) // arrives while the query is DOWN
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val seqs = spark.read.parquet(sink)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == (1L to 7L), seqs) // nothing dropped, nothing reprocessed
  }

  test("maxFilesPerTrigger admits one file per micro-batch") {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_rate").toString
    (1 to 4).foreach { f =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(d, s"f$f.json"),
        s"""{"event_type":"ADD","event_seq":$f,"ts":"2020-01-01T00:00:00.000Z","id":"x/$f","namespace":"ns","name":"n$f","kind":"D","apiVersion":"apps/v1","apiGroup":"apps","labels":null,"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}""")
    }
    val q = spark.readStream.format(fmt).option("maxFilesPerTrigger", 1).load(d)
      .select("event_seq")
      .writeStream.format("memory").queryName("dsv2_rate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dsv2_rate").head.getLong(0) == 4)
      // one file (= one row here) admitted per batch, so 4 non-empty batches
      val perBatch = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
      assert(perBatch.size >= 4 && perBatch.forall(_ == 1), perBatch)
    } finally { q.stop(); spark.catalog.dropTempView("dsv2_rate") }
  }

  test("the write half round-trips through both readers, no temp files left") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dsv2_write").toString
    val rows = (1 to 25).map { i =>
      ResourceEventRow(
        "ADD", i.toLong, new Timestamp(i * 1234L),
        s"ns/apps/v1/D/n$i", "ns", s"n$i", "D", "apps/v1", "apps",
        Map("k" -> s"v$i"), if (i % 4 == 0) null else Map("a" -> "b"),
        new Timestamp(i * 1000L))
    }
    rows.toDS().toDF().repartition(3)
      .write.format(fmt).mode("append").save(out)
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq // LocalFS .crc shadows are not data
    assert(files.nonEmpty && files.forall(_.endsWith(".json")), files)
    val viaCustom = spark.read.format(fmt).load(out)
      .orderBy("event_seq").collect().map(_.toSeq).toSeq
    val viaBuiltin = {
      import org.apache.spark.sql.Encoders
      spark.read.schema(Encoders.product[ResourceEventRow].schema).json(out)
        .orderBy("event_seq").collect().map(_.toSeq).toSeq
    }
    val original = rows.sortBy(_.event_seq).toDF()
      .collect().map(_.toSeq).toSeq
    assert(viaCustom.size == 25)
    assert(viaCustom == viaBuiltin)
    assert(viaCustom == original)
  }

  test("a second write commit appends files the streaming contract can tail") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dsv2_append").toString
    def batch(range: Range) = range.map(i => ResourceEventRow(
      "ADD", i.toLong, new Timestamp(0), s"x/$i", "ns", s"n$i", "D",
      "apps/v1", "apps", null, null, new Timestamp(0))).toDS().toDF()
    // no sleep between commits: nextEpoch() guarantees strictly increasing
    // epoch prefixes even for back-to-back same-millisecond commits
    batch(1 to 3).coalesce(1).write.format(fmt).mode("append").save(out)
    batch(4 to 6).coalesce(1).write.format(fmt).mode("append").save(out)
    val names = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(names.size == 2, names)
    // sorted file order must equal commit order (the streaming offset contract)
    val firstFileSeqs = spark.read.format(fmt)
      .load(s"$out/${names.head}").collect().map(_.getLong(1)).sorted.toSeq
    assert(firstFileSeqs == Seq(1L, 2L, 3L), firstFileSeqs)
  }

  test("streaming write commits epoch-deterministic files readable by both readers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_dsv2_swrite").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dsv2_swrite_ckpt").toString
    val source = MemoryStream[(Long, String)]
    val events = source.toDS().map { case (i, n) =>
      ResourceEventRow("ADD", i, new Timestamp(0), s"x/$i", "ns", n, "D",
        "apps/v1", "apps", null, null, new Timestamp(0))
    }
    val q = events.writeStream.format(fmt)
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      source.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      source.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    // visible names carry (epoch, partition) only — a replayed epoch would
    // rewrite these exact files rather than append attempt-suffixed
    // duplicates (attempts only ever differ in their .tmp names)
    assert(files.forall(_.matches("part-\\d{13}-\\d{5}\\.json")), files)
    val seqs = spark.read.format(fmt).load(out)
      .select("event_seq").collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == Seq(1L, 2L, 3L), seqs)
  }

  test("a malformed line fails the scan by default and skips under mode=permissive") {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_corrupt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "mixed.json"),
      Seq(
        s"""{"event_type":"ADD","event_seq":1,"ts":"2020-01-01T00:00:00.000Z","id":"x/1","namespace":"ns","name":"n1","kind":"D","apiVersion":"apps/v1","apiGroup":"apps","labels":null,"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}""",
        """{"event_type":"ADD","event_seq":2,TRUNCATED GARBAGE""",
        s"""{"event_type":"ADD","event_seq":3,"ts":"2020-01-01T00:00:00.000Z","id":"x/3","namespace":"ns","name":"n3","kind":"D","apiVersion":"apps/v1","apiGroup":"apps","labels":null,"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}""")
        .mkString("\n"))
    intercept[org.apache.spark.SparkException] {
      spark.read.format(fmt).load(d).count()
    }
    val seqs = spark.read.format(fmt).option("mode", "permissive").load(d)
      .select("event_seq").collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == Seq(1L, 3L), seqs)
  }

  test("empty and missing directories read as empty, not as errors") {
    val empty = java.nio.file.Files.createTempDirectory("graft_dsv2_empty").toString
    assert(spark.read.format(fmt).load(empty).isEmpty)
    assert(spark.read.format(fmt).load(s"$empty/nope").isEmpty)
  }

  test("short names resolve: format(\"graft-events\") and SQL USING graft_events") {
    assert(spark.read.format("graft-events").load(dir).count() == 40)
    spark.sql("DROP TABLE IF EXISTS graft_ev_tbl")
    spark.sql(s"CREATE TABLE graft_ev_tbl USING graft_events OPTIONS (path '$dir')")
    try {
      val n = spark.sql("SELECT count(*) AS n FROM graft_ev_tbl")
        .collect()(0).getLong(0)
      assert(n == 40)
    } finally spark.sql("DROP TABLE graft_ev_tbl")
  }

  test("a write frame with the right names but wrong types fails at plan time") {
    val out = java.nio.file.Files.createTempDirectory("graft_dsv2_badtypes").toString
    // int event_seq is UPCAST by Spark's output resolver (safe widening) —
    // the write must succeed with the table's long type on disk
    spark.read.format(fmt).load(dir).limit(2)
      .withColumn("event_seq", col("event_seq").cast("int"))
      .write.format(fmt).mode("append").save(out)
    assert(spark.read.format(fmt).load(out)
      .schema("event_seq").dataType.typeName == "long")
    // a NON-upcastable mismatch (ts as string) must fail at plan time with
    // a field-level message, never as an executor ClassCastException
    val bad = spark.read.format(fmt).load(dir)
      .withColumn("ts", col("ts").cast("string"))
    val e = intercept[Throwable] {
      bad.write.format(fmt).mode("append").save(out)
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("ts"), chain)
    assert(!chain.contains("ClassCastException"), chain)
    // container NULLABILITY must not be rejected: a frame whose maps are
    // value-non-nullable (map(lit, lit)) is safely writable
    spark.read.format(fmt).load(dir).limit(1)
      .withColumn("labels", map(lit("k"), lit("v")))
      .write.format(fmt).mode("append").save(out)
    assert(spark.read.format(fmt).load(out)
      .filter(col("labels")("k") === "v").count() == 1)
  }

  test("streaming offset pins the last consumed file name and fails loudly on lexical violations") {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_offs").toString
    def writeFile(name: String): Unit = java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, name),
      s"""{"event_type":"ADD","event_seq":1,"ts":"2020-01-01T00:00:00.000Z","id":"x/1","namespace":"ns","name":"n1","kind":"D","apiVersion":"apps/v1","apiGroup":"apps","labels":null,"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}\n""")
    writeFile("5.json")
    val stream = new EventLogMicroBatchStream(d, EventLogSource.schema, Array.empty)
    val start = stream.initialOffset()
    val end1 = stream.latestOffset()
    // the offset carries the consumed prefix's last NAME, round-trips, and
    // plans exactly the new file
    assert(end1.json().contains("\"last\":\"5.json\""), end1.json())
    assert(stream.deserializeOffset(end1.json()).json() == end1.json())
    assert(stream.planInputPartitions(start, end1).length == 1)
    // a writer that violates the zero-padded/lexical contract: "10.json"
    // sorts BEFORE the already-consumed "5.json" — a bare count offset
    // would silently re-read 10.json as "the new file" and never see 5.json
    // again; the pinned name turns that into a loud failure
    writeFile("10.json")
    intercept[IllegalStateException] {
      stream.latestOffset(end1, stream.getDefaultReadLimit)
    }
    intercept[IllegalStateException] {
      stream.planInputPartitions(end1, stream.latestOffset())
    }
    // a pre-name (count-only) checkpoint still deserializes and is accepted
    // once without the prefix check
    val legacy = stream.deserializeOffset("1")
    assert(stream.planInputPartitions(legacy, stream.latestOffset()).length == 1)
  }

  test("no-arg latestOffset() enforces the prefix contract against the committed offset") {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_commit").toString
    def writeFile(name: String): Unit = java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, name),
      s"""{"event_type":"ADD","event_seq":1,"ts":"2020-01-01T00:00:00.000Z","id":"x/1","namespace":"ns","name":"n1","kind":"D","apiVersion":"apps/v1","apiGroup":"apps","labels":null,"annotations":null,"createdAt":"2020-01-01T00:00:00.000Z"}\n""")
    writeFile("5.json")
    val stream = new EventLogMicroBatchStream(d, EventLogSource.schema, Array.empty)
    val end1 = stream.latestOffset()
    // before any commit there is no anchor — the plain engine path cannot
    // check (it has no start offset); the per-batch checks still run in
    // planInputPartitions
    stream.commit(end1)
    // "10.json" sorts BEFORE the consumed "5.json": with the committed
    // anchor, even the no-argument variant now fails loudly instead of
    // computing an end offset from the corrupted listing (ADVICE r6)
    writeFile("10.json")
    intercept[IllegalStateException] { stream.latestOffset() }
    // a replayed OLDER commit (or a name-less pre-upgrade one) must not
    // downgrade the anchor
    stream.commit(stream.deserializeOffset("1"))
    intercept[IllegalStateException] { stream.latestOffset() }
  }
}
