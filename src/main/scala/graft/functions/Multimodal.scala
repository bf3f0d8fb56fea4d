package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `BINARY`
  * columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run per-partition so codec state (in a real deployment, a
  * native decoder handle) is initialized once per task, not per row.
  *
  * The decode itself is STUBBED (this container ships no image/audio codecs):
  * `decodeStub` derives deterministic fake dimensions/format from the bytes.
  * Everything around it — binary schema, partition-level batching, the typed
  * output shape — is the real 100 TB-scale design: a scan of binary blobs,
  * embarrassingly parallel decode, no shuffle until a later aggregation.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      format: String,
      n_frames: Int)

  private val formats = Array("jpeg", "png", "webp")

  /** STUB decoder: deterministic metadata from blob length + first bytes.
    * Replace with a real codec (e.g. TwelveMonkeys/javacv) in deployment —
    * the signature (bytes → meta) and the partition batching stay the same.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 320 + n % 320,
      height = 240 + n % 240,
      format = formats(n % 3),
      n_frames = math.min(n % 10, 5) + 1)
  }

  /** Frame sampling stub: every k-th "frame" index, capped — the Spark-side
    * shape (one row per sampled frame, exploded) is real.
    */
  def sampleFrames(meta: MediaMeta, stride: Int): Seq[Int] =
    (0 until meta.n_frames by math.max(1, stride)).toSeq

  /** documents(text) → (doc_id, blob BINARY) → decoded metadata Dataset.
    * The per-partition iterator is where a real decoder would amortize
    * init cost; the decode is a narrow transformation (no shuffle).
    */
  def decodeMeta(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real deployment: val codec = Decoder.open() here, once per task
        it.map { case (id, blob) => decodeStub(id, blob) }
      }
  }
}
