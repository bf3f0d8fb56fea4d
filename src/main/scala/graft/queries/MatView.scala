package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained materialized aggregate view.
  *
  * The reference's sync loop keeps a DERIVED store continuously consistent
  * with a churning source (internal/controller/debounce.go feeding
  * internal/client/rest.go); this is the same contract for an AGGREGATE:
  * `count(*)` + exact `sum(col)` per group key, kept fresh by deltas
  * instead of recomputation. The design is a delta log of SIGNED partial
  * aggregates — the retract-stream form (Flink's `Retract` mode;
  * Lambda-free incremental view maintenance, Griffin/Libkin SIGMOD'95's
  * count-annotated relations):
  *
  *   - `outDir/delta/e<K>` holds epoch K's partials: per-key
  *     (mv_cnt, mv_sum_<col>...) where retractions carry NEGATIVE counts
  *     and sums. Inserts and deletes of base rows are therefore the same
  *     merge operation — serving is `sum()` over partials with
  *     `mv_cnt > 0` (a group retracted to zero vanishes, exactly as if
  *     the base rows never existed).
  *   - `outDir/_view/meta/e<K>` commits epoch K (commit-marker protocol
  *     shared with [[IndexedLayout]]/[[InvertedIndex]]: data dirs first,
  *     marker last; anything above the committed epoch is an orphan and
  *     is rolled back by the next verb, so a crashed refresh can never be
  *     resurrected by a later commit taking the same epoch number).
  *     Meta also records the HISTORY FLOOR: the lowest delta epoch a
  *     serve may read. [[compact]] consolidates floor..epoch into one
  *     dir at epoch+1 and raises the floor to it BEFORE dropping the
  *     originals — a crash between commit and drop leaves stale dirs
  *     that serving already ignores (no double count), and the retry
  *     just re-drops them.
  *
  * Why this scales where recomputation cannot: a refresh touches ONLY the
  * delta — one map-side-combined shuffle of the delta rows on the group
  * key — never the 100 TB base table. Serving merges at most
  * (epoch − floor + 1) partial frames, each bounded by the group-key
  * cardinality, and compaction keeps that count constant under sustained
  * churn. Sums aggregate in DECIMAL(28,10): exact addition means a
  * retraction subtracts bit-for-bit what its insert added, so a group
  * retracted to zero is EXACTLY zero, not a float residue.
  *
  * Only subtractable aggregates live here (count/sum/avg=sum÷cnt);
  * min/max are not retractable without the base and are served by the
  * ordinary agg queries instead — the honest boundary every IVM system
  * draws.
  */
object MatView {
  import EpochStore.{clearDirsAbove, committedEpochs, CommitMarker, dirEpoch, fsOf}
  private def deltaDir(outDir: String) = s"$outDir/delta"
  private def metaDir(outDir: String) = s"$outDir/_view/meta"

  private def writeMeta(spark: SparkSession, outDir: String, epoch: Int,
      floor: Int, keys: Seq[String], vals: Seq[String],
      streamEpoch: Long): Unit = {
    val p = s"${metaDir(outDir)}/e$epoch"
    // driver-side single-row write (MetaIO): a one-row record needs no
    // Spark job and no Hadoop commit — the marker below is the commit point
    MetaIO.writeRow(spark, p, "epoch" -> epoch, "floor" -> floor,
      "keys" -> MetaIO.Strs(keys), "vals" -> MetaIO.Strs(vals),
      "stream_epoch" -> streamEpoch)
    val marker = new org.apache.hadoop.fs.Path(p, CommitMarker)
    fsOf(spark, p).create(marker, true).close()
  }

  /** One committed meta record. */
  private final case class Meta(epoch: Int, floor: Int, keys: Seq[String],
      vals: Seq[String], streamEpoch: Long)

  /** Read the committed meta at `at` (default: the newest). ONE parquet
    * read on the default path — this sits on MatViewSync's per-micro-
    * batch hot path, so every verb reads meta exactly once per call. For
    * a pinned past epoch, a second read of the live record enforces the
    * history-floor contract.
    */
  private def readMetaFull(spark: SparkSession, outDir: String,
      at: Option[Int] = None): Meta = {
    val md = new org.apache.hadoop.fs.Path(metaDir(outDir))
    val epochs = committedEpochs(spark, metaDir(outDir), "view")
    val e = at match {
      case Some(k) =>
        require(epochs.contains(k), s"epoch $k was never committed under $md")
        k
      case None => epochs.max
    }
    // driver-side read (MetaIO): no Spark job on this every-verb hot path
    val r = MetaIO.readHead(spark, s"${metaDir(outDir)}/e$e")
    if (at.isDefined && e != epochs.max) {
      // a past epoch whose deltas compaction has already dropped is gone —
      // same history-floor contract as the index stores' time travel
      val live = MetaIO.readHead(spark, s"${metaDir(outDir)}/e${epochs.max}")
      require(r.getInt("floor") >= live.getInt("floor"),
        s"epoch $e predates the compaction floor ${live.getInt("floor")}")
    }
    Meta(e, r.getInt("floor"),
      r.getStringSeq("keys"),
      r.getStringSeq("vals"),
      r.getLong("stream_epoch"))
  }

  /** Committed (epoch, floor, keys, vals); `at` pins a past epoch for
    * time travel — it must still be committed AND at or above the history
    * floor the compactions have raised.
    */
  def readMeta(spark: SparkSession, outDir: String,
      at: Option[Int] = None): (Int, Int, Seq[String], Seq[String]) = {
    val m = readMetaFull(spark, outDir, at)
    (m.epoch, m.floor, m.keys, m.vals)
  }

  /** High-water mark of the CDC stream epochs already folded into the
    * view (−1 if none): the [[graft.pipeline.MatViewSync]] replay gate.
    * Living INSIDE the meta commit makes refresh+dedup atomic — there is
    * no marker-after-commit crash window in which a replayed stream epoch
    * could double-apply its retractions.
    */
  def lastStreamEpoch(spark: SparkSession, outDir: String): Long =
    readMetaFull(spark, outDir).streamEpoch

  /** Roll back UNCOMMITTED delta dirs (epoch above the committed one — a
    * crashed refresh/compact wrote data but never its meta marker). Every
    * epoch-advancing verb calls this first, so a later verb committing
    * the same epoch number can never make a crashed pass's partials live.
    */
  private def clearUncommitted(spark: SparkSession, outDir: String,
      committed: Int): Unit =
    clearDirsAbove(spark, deltaDir(outDir), committed)

  /** Signed per-key partials of one delta: mv_cnt = ±count(*), one exact
    * decimal mv_sum per value column. One map-side-combined shuffle of
    * the delta rows on the group key — the entire cost of a refresh.
    */
  private def partials(df: DataFrame, keys: Seq[String], vals: Seq[String],
      sign: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        (count(lit(1)) * sign).as("mv_cnt"),
        vals.map(v => (sum(col(v).cast(DecimalType(28, 10))) * sign)
          .cast(DecimalType(28, 10)).as(s"mv_sum_$v")): _*)

  /** Create the view: epoch-0 partials over the base frame. The ONLY verb
    * that ever reads the base relation.
    */
  def bootstrap(spark: SparkSession, base: DataFrame, keys: Seq[String],
      vals: Seq[String], outDir: String): Unit = {
    // wipe any prior view: overwriting only e0 would leave a previous
    // incarnation's higher committed epochs live, and readMeta would keep
    // serving THAT view. But only a dir that IS a prior view (its
    // `_view/meta` exists) or is empty may be wiped — a caller pointing
    // bootstrap at a populated non-view path must fail loudly, not lose
    // unrelated data (the sibling stores wipe via Spark's overwrite of
    // their own layout only, which has the same containment).
    val fs = fsOf(spark, outDir)
    val root = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(root)) {
      require(fs.listStatus(root).isEmpty ||
        fs.exists(new org.apache.hadoop.fs.Path(metaDir(outDir))),
        s"bootstrap target $outDir is non-empty and not a prior MatView " +
          "(no _view/meta) — refusing to delete unrelated data")
      require(fs.delete(root, true), s"could not clear $root")
    }
    partials(base, keys, vals, 1)
      .write.mode("overwrite").parquet(s"${deltaDir(outDir)}/e0")
    writeMeta(spark, outDir, 0, 0, keys, vals, -1L)
  }

  /** Apply one delta: `inserts` are base rows added, `retracts` base rows
    * removed (pass the SAME row shape as the base; an update is a retract
    * of the old row + insert of the new). Cost ∝ delta size only. Returns
    * the committed epoch. Idempotent on retry after a crash: the epoch
    * dir name is deterministic and the orphan rollback clears a half-
    * written attempt first.
    */
  def refresh(spark: SparkSession, outDir: String, inserts: DataFrame,
      retracts: DataFrame, streamEpoch: Long = -1L): Int = {
    val Meta(epoch, floor, keys, vals, prevHwm) = readMetaFull(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    // the stream high-water mark only advances (a manual refresh between
    // stream epochs must not reset the replay gate)
    val hwm = math.max(streamEpoch, prevHwm)
    val next = epoch + 1
    // ONE map-side-combined shuffle of the signed raw rows (guide §2.4):
    // the previous form aggregated each side separately and re-aggregated
    // the union — three exchanges on the group key for one delta. Summing
    // sign-weighted rows directly is bit-identical: mv_cnt = Σ(±1) equals
    // (count·sign)+(count·−sign), and the DECIMAL(28,10) sums are EXACT
    // (no rounding), so regrouping the addition cannot change a digit.
    val delta = inserts.withColumn("_sgn", lit(1))
      .unionByName(retracts.withColumn("_sgn", lit(-1)))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("_sgn").as("mv_cnt"),
        vals.map(v => sum((col(v).cast(DecimalType(28, 10)) * col("_sgn"))
            .cast(DecimalType(28, 10)))
          .cast(DecimalType(28, 10)).as(s"mv_sum_$v")): _*)
      .filter(col("mv_cnt") =!= 0 ||
        vals.map(v => col(s"mv_sum_$v") =!= 0).foldLeft(lit(false))(_ || _))
    delta.write.mode("overwrite").parquet(s"${deltaDir(outDir)}/e$next")
    writeMeta(spark, outDir, next, floor, keys, vals, hwm)
    next
  }

  /** CDC adapter: one frame of base rows + an `op` column (INSERT/DELETE,
    * the reference's event verbs) becomes one refresh epoch.
    */
  def applyCdc(spark: SparkSession, outDir: String, events: DataFrame,
      opCol: String = "op", streamEpoch: Long = -1L): Int =
    refresh(spark, outDir,
      events.filter(upper(col(opCol)) === "INSERT").drop(opCol),
      events.filter(upper(col(opCol)) === "DELETE").drop(opCol),
      streamEpoch)

  /** The view: groups with a live (positive) count, exact decimal sums.
    * Reads only delta epochs floor..asOf — never the base. `asOf` time-
    * travels to a past committed epoch (at or above the history floor).
    */
  /** The merged partial state floor..asOf, UNFILTERED: groups whose
    * pending count is zero or negative stay (e.g. a retraction whose
    * matching insert hasn't streamed in yet under out-of-order CDC) —
    * this is the frame compaction must persist, or consolidation would
    * erase in-flight retractions and change later answers.
    */
  private def merged(spark: SparkSession, outDir: String,
      asOf: Option[Int]): (DataFrame, Seq[String]) = {
    val m = readMetaFull(spark, outDir, asOf)
    val fs = fsOf(spark, outDir)
    val dirs = (m.floor to m.epoch).map(i => s"${deltaDir(outDir)}/e$i")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val df = spark.read.parquet(dirs: _*)
      .groupBy(m.keys.map(col): _*)
      .agg(
        sum("mv_cnt").as("mv_cnt"),
        m.vals.map(v => sum(s"mv_sum_$v").cast(DecimalType(28, 10))
          .as(s"mv_sum_$v")): _*)
    (df, m.vals)
  }

  def serve(spark: SparkSession, outDir: String,
      asOf: Option[Int] = None): DataFrame =
    merged(spark, outDir, asOf)._1.filter(col("mv_cnt") > 0)

  /** Store-level statistics of a view — the [[IndexedLayout.describe]]
    * family's aggregate member: `deltaDirs` is the serve-time merge width
    * [[compact]] exists to bound, `groupsPending` counts groups whose
    * merged count is ≤ 0 (in-flight retractions under out-of-order CDC —
    * present but not served), and `streamEpoch` is the replay gate's
    * high-water mark.
    */
  final case class ViewStats(epoch: Int, floor: Int, streamEpoch: Long,
      deltaDirs: Int, groupsServed: Long, groupsPending: Long)

  def describe(spark: SparkSession, outDir: String): ViewStats = {
    val m = readMetaFull(spark, outDir)
    val fs = fsOf(spark, outDir)
    val dirs = (m.floor to m.epoch).count(i =>
      fs.exists(new org.apache.hadoop.fs.Path(s"${deltaDir(outDir)}/e$i")))
    val g = merged(spark, outDir, None)._1
      .agg(count(lit(1)).as("all"),
        count(when(col("mv_cnt") > 0, 1)).as("served")).head
    ViewStats(m.epoch, m.floor, m.streamEpoch, dirs,
      g.getLong(1), g.getLong(0) - g.getLong(1))
  }

  /** Consolidate floor..epoch into ONE delta dir and raise the floor to
    * it, bounding serve-time merge width under sustained churn. Crash-
    * safe at every cut: the consolidated dir is invisible until the meta
    * commit; after the commit the raised floor hides the stale originals
    * from serving, so the post-commit drop window cannot double count and
    * a retry simply re-drops. Returns (newEpoch, groupsKept).
    */
  def compact(spark: SparkSession, outDir: String): (Int, Long) = {
    val Meta(epoch, floor, keys, vals, hwm) = readMetaFull(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val next = epoch + 1
    // consolidate the UNFILTERED merge: only exactly-cancelled groups
    // (zero count AND zero sums) may drop. Persisting the served (cnt>0)
    // view instead would erase pending retractions — under out-of-order
    // CDC a DELETE that precedes its INSERT nets negative until the
    // insert arrives, and dropping it here would let the later insert
    // resurrect the row.
    val (mergedDf, _) = merged(spark, outDir, None)
    val consolidated = mergedDf
      .filter(col("mv_cnt") =!= 0 ||
        vals.map(v => col(s"mv_sum_$v") =!= 0).foldLeft(lit(false))(_ || _))
    // ONE materialization (r19, guide §1.2): write the consolidated frame
    // directly and read `kept` back from the written files' parquet
    // footers — a metadata-only job. The previous localCheckpoint +
    // count + write computed the merge twice (checkpoint, then write
    // from the checkpoint) to get the same number.
    consolidated.write.mode("overwrite").parquet(s"${deltaDir(outDir)}/e$next")
    val kept = spark.read.parquet(s"${deltaDir(outDir)}/e$next").count()
    writeMeta(spark, outDir, next, next, keys, vals, hwm)
    // drop everything below the NEW floor — including sub-`floor` strays
    // a previous compact left when it crashed between its meta commit and
    // its drop loop (they are below the old floor, so the ordinary
    // floor..epoch range would never revisit them)
    val fs = fsOf(spark, outDir)
    val dd = new org.apache.hadoop.fs.Path(deltaDir(outDir))
    fs.listStatus(dd).map(_.getPath)
      .filter(p => dirEpoch(p.getName).exists(_ < next))
      .foreach(p => require(fs.delete(p, true), s"could not drop $p"))
    (next, kept)
  }

  import graft.Canon._

  /** Catalog row: the full IVM lifecycle on `orders`, ORACLE-EXACT. Boot
    * from the even-orderkey half, insert the odd half, retract every
    * orderkey ≡ 3 (mod 10), compact, serve — the result must equal a
    * plain GROUP BY over `orders` minus the retracted keys, which is
    * exactly what the DuckDB oracle computes from the base table.
    */
  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_matview_refresh",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val d = java.nio.file.Files
          .createTempDirectory("graft_matview").toString
        try {
          bootstrap(s, orders.filter(col("o_orderkey") % 2 === 0),
            Seq("o_custkey"), Seq("o_totalprice"), d)
          refresh(s, d, orders.filter(col("o_orderkey") % 2 === 1),
            orders.limit(0))
          refresh(s, d, orders.limit(0),
            orders.filter(col("o_orderkey") % 10 === 3))
          compact(s, d)
          // bounded result (≤ |custkey| rows) pinned off the view files so
          // the temp dir can be deleted before the caller consumes it
          serve(s, d)
            .select(col("o_custkey"), col("mv_cnt").as("n"),
              r4(col("mv_sum_o_totalprice").cast("double")).as("total"))
            .orderBy("o_custkey")
            .localCheckpoint()
        } finally org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(d))
      },
      Some("""SELECT o_custkey, count(*) AS n,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE), 4) AS total
             FROM orders WHERE NOT (o_orderkey % 10 = 3)
             GROUP BY o_custkey ORDER BY o_custkey""")))
}
