package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-operator semantics (SURVEY.md §2.B streaming table): watermark +
  * tumbling window aggregation with late-data drop, streaming dedup, and
  * stream-static join. These use event-time (no processing-time timers), so
  * `processAllAvailable()` is safe here.
  */
class StreamingOpsSpec extends SparkSpec {

  private case class Ev(ts: Timestamp, user: Long, value: Double)
  private def t(min: Int) = new Timestamp(min * 60000L)

  test("watermark + tumbling window: closed windows drop late events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Timestamp, Long, Double)]
    val agg = source.toDS().toDF("ts", "user", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val query = agg.writeStream.outputMode("append").format("memory")
      .queryName("win_agg").start()
    try {
      // batch 1: two windows' worth of events
      source.addData((t(1), 1L, 10.0), (t(2), 1L, 20.0), (t(6), 2L, 5.0))
      query.processAllAvailable()
      // batch 2: advance event time far past watermark → closes window [0,5)
      source.addData((t(30), 3L, 1.0))
      query.processAllAvailable()
      // batch 3: a late event for the closed [0,5) window must be dropped
      source.addData((t(3), 9L, 999.0))
      query.processAllAvailable()
      // batch 4: advance again so [5,10) also closes
      source.addData((t(60), 3L, 1.0))
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT window.start AS ws, n, total FROM win_agg ORDER BY ws""").collect()
      val w0 = rows.find(_.getAs[Timestamp]("ws").getTime == 0L).get
      assert(w0.getAs[Long]("n") == 2) // late 999.0 event NOT counted
      assert(w0.getAs[Double]("total") == 30.0)
      val w5 = rows.find(_.getAs[Timestamp]("ws").getTime == 5 * 60000L).get
      assert(w5.getAs[Long]("n") == 1 && w5.getAs[Double]("total") == 5.0)
    } finally { query.stop(); spark.catalog.dropTempView("win_agg") }
  }

  test("streaming session windows merge gap-bounded events, split on gaps") {
    // closes VERDICT r2 "missing #5": session_window as an actual stream
    // (q_stream_session oracle-checks only the batch form)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Timestamp, Long, Double)]
    val agg = source.toDS().toDF("ts", "user", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val query = agg.writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    try {
      // user 1: 1', 3', 6' — gaps < 5' chain into ONE session [1', 11')
      // user 2: 2' and 20' — the 18' gap splits into two sessions
      source.addData((t(1), 1L, 1.0), (t(3), 1L, 2.0), (t(6), 1L, 3.0),
        (t(2), 2L, 5.0))
      query.processAllAvailable()
      source.addData((t(20), 2L, 7.0)) // second session; also advances watermark
      query.processAllAvailable()
      source.addData((t(60), 9L, 0.0)) // push watermark far past everything
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT user, session_window.start AS ws, session_window.end AS we,
           n, total FROM sess WHERE user < 9 ORDER BY user, ws""").collect()
        .map(r => (r.getLong(0), r.getAs[Timestamp]("ws").getTime / 60000,
          r.getAs[Timestamp]("we").getTime / 60000, r.getAs[Long]("n"),
          r.getAs[Double]("total")))
      assert(rows.toSeq == Seq(
        (1L, 1, 11, 3L, 6.0),  // merged session: last event 6' + 5' gap
        (2L, 2, 7, 1L, 5.0),
        (2L, 20, 25, 1L, 7.0)))
    } finally { query.stop(); spark.catalog.dropTempView("sess") }
  }

  test("streaming dropDuplicates with watermark dedups across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Timestamp, Long, Double)]
    val deduped = source.toDS().toDF("ts", "id", "value")
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("id")
    val query = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_s").start()
    try {
      source.addData((t(1), 100L, 1.0), (t(2), 100L, 2.0), (t(3), 200L, 3.0))
      query.processAllAvailable()
      source.addData((t(4), 100L, 4.0), (t(5), 300L, 5.0)) // 100 is a dup
      query.processAllAvailable()
      val ids = spark.sql("SELECT id FROM dedup_s ORDER BY id").collect().map(_.getLong(0))
      assert(ids.toSeq == Seq(100L, 200L, 300L)) // each id exactly once
    } finally { query.stop(); spark.catalog.dropTempView("dedup_s") }
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    // the state-bounded dedup variant: a duplicate inside the watermark
    // horizon is dropped, but state for expired keys is evictable — the
    // 100 TB-stream answer to dropDuplicates' unbounded key set
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Timestamp, Long, Double)]
    val deduped = source.toDS().toDF("ts", "id", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val query = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm").start()
    try {
      source.addData((t(1), 100L, 1.0), (t(2), 100L, 2.0), (t(3), 200L, 3.0))
      query.processAllAvailable()
      // inside the horizon: 100 is still a dup
      source.addData((t(5), 100L, 4.0))
      query.processAllAvailable()
      // advance the watermark far past 100's entry, then re-emit it:
      // its state is expired, so the same id is accepted again
      source.addData((t(60), 300L, 5.0))
      query.processAllAvailable()
      source.addData((t(61), 100L, 6.0))
      query.processAllAvailable()
      val ids = spark.sql("SELECT id FROM dedup_wm ORDER BY id, value")
        .collect().map(_.getLong(0))
      assert(ids.toSeq == Seq(100L, 100L, 200L, 300L), ids.toSeq)
    } finally { query.stop(); spark.catalog.dropTempView("dedup_wm") }
  }

  test("stream-static join enriches events with a dimension table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val source = MemoryStream[(Timestamp, Long, Double)]
    val joined = source.toDS().toDF("ts", "user", "value")
      .join(broadcast(dim), Seq("user"), "left_outer")
      .select(col("user"), col("tier"), col("value"))
    val query = joined.writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    try {
      source.addData((t(1), 1L, 10.0), (t(2), 2L, 20.0), (t(3), 7L, 30.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT user, tier FROM enriched ORDER BY user").collect()
      assert(rows.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
        Seq(1L -> "gold", 2L -> "silver", 7L -> null))
    } finally { query.stop(); spark.catalog.dropTempView("enriched") }
  }

  test("stream-stream interval join matches clicks to impressions inside the window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    // both sides watermarked → the engine bounds join state by evicting
    // impressions older than watermark − interval (the scale requirement:
    // unbounded-state stream joins OOM; interval + watermark keeps state
    // proportional to the window)
    val i = imps.toDS().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "20 minutes")
    val c = clicks.toDS().toDF("click_ts", "click_ad")
      .withWatermark("click_ts", "20 minutes")
    val joined = i.join(c, expr(
      "ad = click_ad AND click_ts BETWEEN imp_ts AND imp_ts + INTERVAL 10 MINUTES"))
    val query = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin").start()
    try {
      imps.addData((t(1), 100L), (t(2), 200L))
      query.processAllAvailable()
      clicks.addData((t(5), 100L))  // 4 min after its impression → match
      clicks.addData((t(20), 200L)) // 18 min after → outside the interval
      query.processAllAvailable()
      // advance both watermarks so matched results are emittable in append
      imps.addData((t(60), 999L)); clicks.addData((t(60), 998L))
      query.processAllAvailable()
      val rows = spark.sql("SELECT ad FROM ssjoin").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(100L))
    } finally { query.stop(); spark.catalog.dropTempView("ssjoin") }
  }

  test("stream-stream LEFT OUTER join null-completes unmatched rows on watermark expiry") {
    // the hard outer variant: an impression with no click inside the
    // interval must still emit — but only once the watermark PROVES no
    // matching click can arrive. State stays watermark-bounded like the
    // inner form; the null row is the deliverable (the funnel/attribution
    // "no conversion" record at stream scale).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val i = imps.toDS().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
    val c = clicks.toDS().toDF("click_ts", "click_ad")
      .withWatermark("click_ts", "10 minutes")
    val joined = i.join(c, expr(
      "ad = click_ad AND click_ts BETWEEN imp_ts AND imp_ts + INTERVAL 10 MINUTES"),
      "left_outer")
    val query = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssouter").start()
    try {
      imps.addData((t(1), 100L), (t(2), 200L))
      clicks.addData((t(5), 100L)) // ad 100 converts; ad 200 never does
      query.processAllAvailable()
      // push both watermarks far past imp_ts+interval: ad 200's join range
      // is provably empty, so its null-completed row must emit
      imps.addData((t(120), 999L)); clicks.addData((t(120), 998L))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT ad, click_ad FROM ssouter WHERE ad IN (100, 200) ORDER BY ad")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(rows.toSeq == Seq((100L, 100L), (200L, -1L)), rows.toSeq)
    } finally { query.stop(); spark.catalog.dropTempView("ssouter") }
  }

  test("file streaming source tails event JSON with per-trigger rate limit") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val dir = java.nio.file.Files.createTempDirectory("evt_src").toString
    val query = graft.pipeline.SyncPipeline
      .fileSource(spark, dir, maxFilesPerTrigger = 1)
      .groupBy("event_type").count()
      .writeStream.outputMode("complete").format("memory").queryName("file_src").start()
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "a.json"),
        """{"event_type":"ADD","event_seq":1,"ts":"2026-01-01T00:00:00Z","id":"x","namespace":"ns","name":"x","kind":"Pod","apiVersion":"v1","apiGroup":"","labels":{},"annotations":null,"createdAt":"2026-01-01T00:00:00Z"}
          |{"event_type":"DELETE","event_seq":2,"ts":"2026-01-01T00:00:01Z","id":"y","namespace":"ns","name":"y","kind":"Pod","apiVersion":"v1","apiGroup":"","labels":{},"annotations":null,"createdAt":"2026-01-01T00:00:00Z"}
          |""".stripMargin)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "b.json"),
        """{"event_type":"UPDATE","event_seq":3,"ts":"2026-01-01T00:00:02Z","id":"x","namespace":"ns","name":"x","kind":"Pod","apiVersion":"v1","apiGroup":"","labels":{},"annotations":null,"createdAt":"2026-01-01T00:00:00Z"}""")
      query.processAllAvailable()
      val counts = spark.sql("SELECT event_type, count FROM file_src ORDER BY event_type")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(counts == Seq("ADD" -> 1L, "DELETE" -> 1L, "UPDATE" -> 1L))
      // maxFilesPerTrigger=1: the 3 rows arrived across ≥2 micro-batches,
      // never all in one (file a has 2 rows, file b has 1)
      val inputRows = query.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(inputRows.length >= 2 && inputRows.forall(_ <= 2))
    } finally { query.stop(); spark.catalog.dropTempView("file_src") }
  }
}
