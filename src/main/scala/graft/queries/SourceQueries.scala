package graft.queries

import graft.{Canon, Tables}
import graft.functions.Multimodal
import graft.pipeline.Extract
import org.apache.spark.sql.functions._

/** Source formats beyond parquet (JSON lines, CSV — SURVEY.md §2.B sources),
  * the batch change-detection diff (A10/A19), and the multimodal decode
  * plumbing. The scan queries are write-then-read round-trips: the engine
  * exports a table to the format, reads it back with an explicit schema, and
  * aggregates — the oracle runs the same aggregate over the original parquet,
  * so any fidelity loss in the scan path breaks the hash.
  */
object SourceQueries {
  import Canon._

  private def roundTrip(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      fmt: String): org.apache.spark.sql.DataFrame = {
    val out = s"/tmp/graft_src/${fmt}_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val src = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("value"))
    val w = src.coalesce(4).write.mode("overwrite")
    fmt match {
      case "csv" => w.option("header", "true").csv(out)
      case "orc" => w.orc(out)
      case _     => w.json(out)
    }
    val schema = "event_id LONG, event_type STRING, value DOUBLE"
    val back = fmt match {
      case "csv" => s.read.schema(schema).option("header", "true").csv(out)
      case "orc" => s.read.schema(schema).orc(out)
      case _     => s.read.schema(schema).json(out)
    }
    back
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("total"),
        sum(col("event_id")).as("id_sum"))
      .orderBy("event_type")
  }

  private val roundTripOracle =
    s"""SELECT event_type, count(*) AS n,
       round(${Canon.sql.dsum("value")}, 4) AS total,
       CAST(sum(event_id) AS BIGINT) AS id_sum
       FROM events GROUP BY 1 ORDER BY 1"""

  val qs: Seq[GQuery] = Seq(
    GQuery("q_src_jsonl", (s, dir) => roundTrip(s, dir, "json"), Some(roundTripOracle)),
    GQuery("q_src_csv", (s, dir) => roundTrip(s, dir, "csv"), Some(roundTripOracle)),
    // columnar binary format with its own encoder stack (dictionary, RLE,
    // zlib) — the third on-disk representation the engine round-trips
    GQuery("q_src_orc", (s, dir) => roundTrip(s, dir, "orc"), Some(roundTripOracle)),

    GQuery(
      "q_src_dsv2",
      (s, dir) => {
        // Round-trip through the engine's OWN DataSource V2 reader
        // (graft.sources.EventLogSource): events are exported in the
        // pipeline's event-log shape (strings, longs, timestamps, a map
        // column, a null map), then read back via the custom TableProvider
        // and aggregated — the oracle recomputes from the original
        // parquet, so any fidelity loss in the custom parser (timestamp
        // micros, map entries, nulls) breaks the hash.
        val out = s"/tmp/graft_src/dsv2_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
        val export = Tables.events(s, dir).select(
            col("event_type"),
            col("event_id").as("event_seq"),
            col("ts"),
            concat_ws("/", col("user_id"), lit("apps/v1"),
              col("event_type"), col("event_id")).as("id"),
            concat(lit("ns"), pmod(col("user_id"), lit(5))).as("namespace"),
            concat(lit("n"), col("event_id")).as("name"),
            col("event_type").as("kind"),
            lit("apps/v1").as("apiVersion"),
            lit("apps").as("apiGroup"),
            map(lit("u"), col("user_id").cast("string")).as("labels"),
            lit(null).cast("map<string,string>").as("annotations"),
            col("ts").as("createdAt"))
        // spread, not coalesce: the local events scan is ONE split and
        // coalesce cannot raise a partition count, so the JSON encode ran
        // single-core and the read-back saw one file. The spread also gives
        // the DSv2 read one split per file; a wide input passes through
        // (Spread.ifNarrow) so a warehouse-scale export is never coalesced.
        // Row placement across files is irrelevant to the aggregation.
        graft.Spread.ifNarrow(export, s.sparkContext.defaultParallelism)
          .write.mode("overwrite").json(out)
        s.read.format("graft.sources.EventLogSource").load(out)
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n"),
            sum(col("event_seq")).as("seq_sum"),
            max(element_at(col("labels"), "u")).as("max_u"),
            fmtTs(min(col("ts"))).as("first_ts"))
          .orderBy("kind")
      },
      Some(s"""SELECT event_type AS kind, count(*) AS n,
              CAST(sum(event_id) AS BIGINT) AS seq_sum,
              max(CAST(user_id AS VARCHAR)) AS max_u,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
              FROM events GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_sync_diff",
      (s, dir) => {
        // Batch change detection (reference watcher.go:315-331 via
        // Extract.diff): two synthetic snapshots derived from events —
        // new-only ids upsert as new, changed metadata upserts as changed,
        // vanished ids delete.
        val e = Tables.events(s, dir)
        val prev = e.filter(col("event_id") % 3 =!= 0).select(
          col("event_id").as("id"),
          map(lit("type"), col("event_type")).as("labels"),
          map(lit("p"), col("props")).as("annotations"))
        val newSnap = e.filter(col("event_id") % 5 =!= 0).select(
          col("event_id").as("id"),
          map(lit("type"),
            when(col("user_id") % 7 === 0, upper(col("event_type")))
              .otherwise(col("event_type"))).as("labels"),
          map(lit("p"), col("props")).as("annotations"))
        Extract.diff(newSnap, prev).orderBy("action", "id")
      },
      Some("""WITH prev AS (
               SELECT event_id AS id, event_type AS t FROM events WHERE event_id % 3 <> 0),
             nw AS (
               SELECT event_id AS id,
                 CASE WHEN user_id % 7 = 0 THEN upper(event_type) ELSE event_type END AS t
               FROM events WHERE event_id % 5 <> 0)
             SELECT coalesce(nw.id, prev.id) AS id,
               CASE WHEN prev.id IS NULL THEN 'upsert-new'
                    WHEN nw.id IS NULL THEN 'delete'
                    WHEN nw.t <> prev.t THEN 'upsert-changed'
                    ELSE 'unchanged' END AS action
             FROM nw FULL JOIN prev ON nw.id = prev.id
             WHERE CASE WHEN prev.id IS NULL THEN 'upsert-new'
                    WHEN nw.id IS NULL THEN 'delete'
                    WHEN nw.t <> prev.t THEN 'upsert-changed'
                    ELSE 'unchanged' END <> 'unchanged'
             ORDER BY action, id""")),

    GQuery(
      "q_mm_decode",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        Multimodal.decodeMeta(Tables.documents(s, dir)).toDF().orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
             CAST(240 + octet_length(encode(text)) % 240 AS INT) AS height,
             (['jpeg','png','webp'])[octet_length(encode(text)) % 3 + 1] AS format,
             CAST(least(octet_length(encode(text)) % 10, 5) + 1 AS INT) AS n_frames
             FROM documents ORDER BY doc_id""")),

    GQuery(
      "q_mm_frames",
      (s, dir) => {
        // Frame sampling through the per-partition decode path: one row per
        // sampled frame (stride 2), exploded executor-side — the video
        // analog of tokenize-then-explode. With a real codec the flatMap
        // emits frame tensors; the row shape, ordering contract, and
        // narrow-until-sort plan are what this query pins down.
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        Multimodal.decodeMeta(Tables.documents(s, dir))
          .flatMap(m => Multimodal.sampleFrames(m, 2).map(f => (m.doc_id, f)))
          .toDF("doc_id", "frame")
          .orderBy("doc_id", "frame")
      },
      Some("""SELECT doc_id,
             CAST(unnest(range(0, least(octet_length(encode(text)) % 10, 5) + 1, 2)) AS INT)
               AS frame
             FROM documents ORDER BY doc_id, frame""")),

    GQuery(
      "q_mm_resize",
      (s, dir) => {
        // Resize planning for the decoded media: fit every image into a
        // 224×224 box preserving aspect ratio — the tensor-prep step before
        // a vision encoder. All-integer arithmetic ((dim·224) DIV longest
        // side) so both engines land on identical pixels; with a real codec
        // the same projection drives the scaler, here it drives the
        // contract. Narrow until the output sort, like every per-doc stage.
        val bin = encode(col("text"), "UTF-8")
        val nBytes = length(bin)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            (lit(320) + pmod(nBytes, lit(320))).as("w"),
            (lit(240) + pmod(nBytes, lit(240))).as("h"))
          .select(col("doc_id"), col("w"), col("h"),
            expr("(w * 224) DIV greatest(w, h)").cast("int").as("out_w"),
            expr("(h * 224) DIV greatest(w, h)").cast("int").as("out_h"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
               320 + octet_length(encode(text)) % 320 AS w,
               240 + octet_length(encode(text)) % 240 AS h
             FROM documents)
             SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
               CAST((w * 224) // greatest(w, h) AS INT) AS out_w,
               CAST((h * 224) // greatest(w, h) AS INT) AS out_h
             FROM d ORDER BY doc_id""")),

    GQuery(
      "q_mm_audio",
      (s, dir) => {
        // Audio-modality plumbing: deterministic fake PCM per doc (the
        // decode stub — no codecs in the container), then the real frame
        // analysis every audio pipeline runs: 32-sample frames at hop 16
        // (50% overlap), RMS energy per frame. Samples are integers from a
        // doc_id-seeded LCG-ish formula so both engines synthesize the
        // identical waveform; sums of squares stay < 2^53, so the double
        // mean is exact and only sqrt's last ulp is at stake (absorbed by
        // r4). Pure expression fan-out — per-doc frame count, not audio
        // length, drives output size; narrow until the output sort.
        val n = (lit(64) + pmod(col("doc_id"), lit(64))).cast("int")
        val nFrames = ((n - 32) / 16 + 1).cast("long")
        val amp = (f: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          pmod(col("doc_id") * 31 + (f * 16 + i) * 17, lit(201)) - 100
        Tables.documents(s, dir)
          .select(col("doc_id"), n.as("n_samples"),
            explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
          .withColumn("sumsq",
            aggregate(
              transform(sequence(lit(0), lit(31)),
                i => amp(col("frame_idx"), i) * amp(col("frame_idx"), i)),
              lit(0L), (acc, v) => acc + v))
          .select(col("doc_id"), col("n_samples"), col("frame_idx"),
            r4(sqrt(col("sumsq").cast("double") / 32.0)).as("rms"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH d AS (SELECT doc_id,
                CAST(64 + doc_id % 64 AS INT) AS n_samples FROM documents),
              f AS (SELECT doc_id, n_samples,
                unnest(range((n_samples - 32) // 16 + 1)) AS frame_idx FROM d)
              SELECT doc_id, n_samples, frame_idx,
                round(sqrt(CAST(list_sum(list_transform(range(0, 32),
                  i -> ((doc_id * 31 + (frame_idx * 16 + i) * 17) % 201 - 100)
                     * ((doc_id * 31 + (frame_idx * 16 + i) * 17) % 201 - 100)))
                  AS DOUBLE) / 32.0), 4) AS rms
              FROM f ORDER BY doc_id, frame_idx""")))
}
