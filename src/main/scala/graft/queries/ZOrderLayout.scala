package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering for multi-dimensional scan
  * pruning — the data-layout lever that makes 2-D box predicates cheap at
  * 100 TB (Morton 1966; the OPTIMIZE ZORDER idiom of modern lakehouse
  * table formats).
  *
  * A linear sort by column X gives parquet row groups tight min/max
  * ranges on X only: a predicate on Y skips nothing and a 100 TB scan
  * stays a 100 TB scan. Interleaving the bits of quantile-bucketed X and
  * Y into one Morton key and range-partition-sorting by it bounds EVERY
  * row group inside a small (x, y) rectangle, so parquet's footer stats
  * prune on BOTH dimensions from the same single copy of the data.
  *
  * Scale shape: bucket boundaries come from one `approxQuantile` pass
  * (Greenwald–Khanna sketch — the same sampling idea Spark's range
  * partitioner uses); bucket assignment is Spark ML's `Bucketizer` — a
  * compiled binary search, O(bits) compares per row and shuffle-free
  * (see [[write]] for the measured 40x gap vs the HOF formulation); the
  * only shuffle is the range repartition by the Morton key that any
  * clustered write needs. Quantile (equal-mass) buckets, not equal-width:
  * skew cannot collapse the curve into a few hot cells, so the per-file
  * rectangle bound — and therefore the pruning guarantee — survives
  * skewed columns.
  *
  * Serving needs NO custom format: `spark.read.parquet(dir).filter(box)`
  * pushes the box to parquet, whose row-group stats do the skipping —
  * the layout is an organization contract, not a new format. The engine's
  * own verbs and catalog row read through [[read]], the committed-epoch
  * file-list gate that hides a crashed [[append]]'s torn delta until its
  * retry commits (what a table format's manifest provides).
  */
object ZOrderLayout {

  /** Morton interleave of the low `bits` bits of two bucket ids (x even
    * positions, y odd): pure shift/mask arithmetic, whole-stage-codegen
    * friendly, no UDF.
    */
  def zvalue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)),
            2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Bucketizer splits from the quantile boundaries: −∞/+∞ rails around
    * the de-duplicated interior cuts (low-cardinality columns repeat
    * quantiles; Bucketizer demands strictly increasing splits — fewer
    * distinct cuts just means a coarser dimension, still ≤ 2^bits
    * buckets).
    */
  private def splitsOf(bounds: Array[Double]): Array[Double] = {
    val interior = bounds.distinct.sorted.drop(1).dropRight(1)
    // a constant column collapses every quantile to one value — keep that
    // single cut so Bucketizer still sees its ≥3-split minimum
    val cuts = if (interior.nonEmpty) interior else bounds.distinct.sorted
    Double.NegativeInfinity +: cuts :+ Double.PositiveInfinity
  }

  import EpochStore.{clearDirsAbove, committedEpochs, CommitMarker, fsOf}
  private def metaRoot(outDir: String) = s"$outDir/_layout/meta"

  /** (committed epoch, bits, colX, colY, splitsX, splitsY) — the layout's
    * PINNED clustering quantizer, persisted at [[write]] so [[append]]
    * buckets deltas identically across sessions (the IndexedLayout
    * pinned-centroid discipline on the data-layout family). Empty splits
    * = the base was empty; the first non-empty append trains and pins
    * them.
    */
  private final case class LayoutMeta(epoch: Int, bits: Int, colX: String,
      colY: String, splitsX: Array[Double], splitsY: Array[Double])

  private def writeMeta(spark: SparkSession, outDir: String,
      m: LayoutMeta): Unit = {
    val p = s"${metaRoot(outDir)}/e${m.epoch}"
    // driver-side single-row write (MetaIO): no Spark job per verb
    MetaIO.writeRow(spark, p, "epoch" -> m.epoch, "bits" -> m.bits,
      "col_x" -> m.colX, "col_y" -> m.colY,
      "splits_x" -> MetaIO.Dbls(m.splitsX.toSeq),
      "splits_y" -> MetaIO.Dbls(m.splitsY.toSeq))
    fsOf(spark, p).create(
      new org.apache.hadoop.fs.Path(p, CommitMarker), true).close()
  }

  private def readMeta(spark: SparkSession, outDir: String): LayoutMeta = {
    val e = committedEpochs(spark, metaRoot(outDir), "z-order layout").max
    val r = MetaIO.readHead(spark, s"${metaRoot(outDir)}/e$e")
    LayoutMeta(e, r.getInt("bits"),
      r.getString("col_x"), r.getString("col_y"),
      r.getDoubleSeq("splits_x").toArray,
      r.getDoubleSeq("splits_y").toArray)
  }

  /** The one clustering pipeline both [[write]] and [[append]] run: pinned
    * splits in, Morton-range-partitioned sorted frame out.
    */
  private def clustered(df: DataFrame, splitsX: Array[Double],
      splitsY: Array[Double], bits: Int, numFiles: Int,
      colX: String, colY: String): DataFrame = {
    val nb = 1 << bits
    val buck = new org.apache.spark.ml.feature.Bucketizer()
      .setInputCols(Array("_zx", "_zy"))
      .setOutputCols(Array("_bx", "_by"))
      .setSplitsArray(Array(splitsX, splitsY))
      .setHandleInvalid("keep") // nulls land in the extra top bucket …
    def clamp(c: Column) = // … and clamp back into [0, 2^bits)
      greatest(lit(0L), least(lit(nb - 1L), c.cast("long")))
    // NOT spread (r19, measured): forcing the scan's 3 local splits to 32
    // before the bucketize+Morton chain regressed q_layout_zorder 2.04 →
    // 3.1-3.4 s — the round-robin exchange pays a local sort plus a full
    // extra materialization of the rows, and the Bucketizer's compiled
    // binary search is too cheap for the added width to buy it back (the
    // knnGraphIvf pre-spread lesson from r18). The range partitioner's
    // sampling pass + shuffle write stay on the scan's own splits.
    buck.transform(df
        .withColumn("_zx", col(colX).cast("double"))
        .withColumn("_zy", col(colY).cast("double")))
      .withColumn("_zv", zvalue(clamp(col("_bx")), clamp(col("_by")), bits))
      .repartitionByRange(numFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zx", "_zy", "_bx", "_by", "_zv")
  }

  /** Quantile boundaries of (colX, colY) over `df` — one approxQuantile
    * (Greenwald–Khanna) pass; empty arrays on an empty frame.
    */
  private def trainBounds(df: DataFrame, colX: String, colY: String,
      bits: Int): (Array[Double], Array[Double]) = {
    val probes = (0 to (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // NOT spread (r19, measured): widening the 3-split local scan to 32
    // before the Greenwald–Khanna pass regressed the query — the sketch
    // inserts ride the same pass as the scan decode, so the spread only
    // adds a full shuffle plus 32-way sketch merges. relativeError stays
    // 0.001: loosening it would coarsen the PINNED quantizer for every
    // later append (the r18 hold, still held).
    val Array(bx, by) = df.na.drop(Seq(colX, colY))
      .stat.approxQuantile(Array(colX, colY), probes, 0.001)
    (bx, by)
  }

  /** Write `df` z-order-clustered on (colX, colY) into `outDir` as
    * `numFiles` range-partitioned parquet files, each internally sorted
    * by the Morton key, plus the pinned quantizer under `_layout/`
    * (invisible to plain readers). The helper columns are dropped before
    * the write (projection preserves the sort), so the layout is
    * invisible in the schema — only in the row-group statistics.
    *
    * Bucket assignment is Spark ML's [[Bucketizer]] — a COMPILED binary
    * search (O(bits) compares/row). The obvious alternative, a
    * `size(filter(boundaries, v >= _))` higher-order function, is NOT
    * whole-stage-codegen'd: Spark evaluates HOF lambdas interpretively
    * per ELEMENT, so 2^bits+1 boundaries × 2 columns × the range
    * partitioner's extra sampling pass cost ~25 s at sf0.1 on a
    * single-file input — measured, and 40× the Bucketizer form.
    */
  def write(spark: SparkSession, df: DataFrame, outDir: String,
      colX: String, colY: String, bits: Int = 8, numFiles: Int = 16): Unit = {
    val (bx, by) = trainBounds(df, colX, colY, bits)
    if (bx.isEmpty || by.isEmpty) { // empty input: nothing to cluster
      df.write.mode("overwrite").parquet(outDir)
      writeMeta(spark, outDir, LayoutMeta(0, bits, colX, colY,
        Array.empty, Array.empty))
      return
    }
    clustered(df, splitsOf(bx), splitsOf(by), bits, numFiles, colX, colY)
      .write.mode("overwrite").parquet(outDir)
    writeMeta(spark, outDir,
      LayoutMeta(0, bits, colX, colY, splitsOf(bx), splitsOf(by)))
  }

  /** Append `df` to a z-ordered layout as `numFiles` NEW files clustered
    * under the PINNED quantizer — the steady-state ingest of a clustered
    * fact table: existing files are never rewritten, the delta's files
    * carry the same per-file Morton rectangles (so box pruning keeps
    * working across base + delta), and only boundary DRIFT degrades the
    * equal-mass property — [[recluster]] is the periodic answer, exactly
    * Delta Lake's append + OPTIMIZE ZORDER division of labor. An empty
    * base's first non-empty append trains and pins the quantizer.
    *
    * CRASH SAFETY: the delta stages under `_layout/` and promotes under
    * deterministic `d<K>-<i>` names with the meta marker committed LAST;
    * a crashed attempt is rolled back by the next verb's
    * [[clearUncommittedFiles]] and the RETRY converges to the same names.
    * The committed-epoch read gate is [[read]] — it keeps only base files
    * plus `d<K ≤ committed>` deltas, so a crashed append is INVISIBLE to
    * it until the commit (spec-pinned). A plain `spark.read.parquet`
    * reader bypasses the gate and keeps the torn window (the
    * manifest-less plain-parquet reality — a table format's manifest is
    * this same file-list gate made universal). Single-writer, like every
    * layout mutation. Returns rows appended.
    */
  def append(spark: SparkSession, df: DataFrame, outDir: String,
      numFiles: Int = 4): Long = {
    val m = readMeta(spark, outDir)
    clearUncommittedFiles(spark, outDir, m.epoch)
    clearDirsAbove(spark, metaRoot(outDir), m.epoch)
    if (df.isEmpty) return 0L
    val next = m.epoch + 1
    val (sx, sy) =
      if (m.splitsX.nonEmpty) (m.splitsX, m.splitsY)
      else { // empty base: this delta trains the quantizer
        val (bx, by) = trainBounds(df, m.colX, m.colY, m.bits)
        (splitsOf(bx), splitsOf(by))
      }
    val staging = s"$outDir/_layout/staging/e$next"
    clustered(df, sx, sy, m.bits, numFiles, m.colX, m.colY)
      .write.mode("overwrite").parquet(staging)
    val fs = fsOf(spark, outDir)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val staged = fs.listStatus(stagingPath).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    staged.zipWithIndex.foreach { case (f, i) =>
      val dest = new org.apache.hadoop.fs.Path(outDir, s"d$next-$i.parquet")
      require(fs.rename(f, dest), s"could not promote $f to $dest")
    }
    writeMeta(spark, outDir, m.copy(epoch = next, splitsX = sx, splitsY = sy))
    fs.delete(stagingPath, true)
    spark.read.parquet((0 until staged.length)
      .map(i => s"$outDir/d$next-$i.parquet"): _*).count()
  }

  /** The COMMITTED-EPOCH read gate — the EpochStore discipline the other
    * stores' readers already have, closing the documented torn-append
    * window: list the table's files and keep the base (`part-*`) plus
    * delta files `d<K>-*` whose epoch K is at or below the committed meta
    * epoch, so a reader can never see a crashed, not-yet-retried append's
    * partial delta. Plain `spark.read.parquet(dir)` remains available for
    * engines that cannot run this gate (the manifest-less plain-parquet
    * caveat stands for THEM); this reader is what the engine's own verbs
    * and catalog row use. The explicit file list still prunes: parquet
    * row-group stats per file are untouched, and the listing is one
    * driver-side directory scan (file-count-sized, never row-sized).
    */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    val committed = readMeta(spark, outDir).epoch
    val fs = fsOf(spark, outDir)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .map(_.getPath)
      .filter { p =>
        p.getName.endsWith(".parquet") &&
          ("^d(\\d+)-".r.findFirstMatchIn(p.getName) match {
            case Some(m) => m.group(1).toInt <= committed // committed deltas
            case None => true // base files — epoch 0 by construction
          })
      }
      .map(_.toString).sorted
    if (files.isEmpty)
      spark.read.parquet(outDir).limit(0) // empty base: schema from the dir
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Store-level statistics — the [[IndexedLayout.describe]] twin for the
    * layout family: committed epoch, file counts by lineage (base vs
    * committed deltas vs uncommitted leftovers a crashed append left), and
    * the pinned quantizer's shape. Bounded work: one directory listing, no
    * data read.
    */
  final case class LayoutStats(epoch: Int, baseFiles: Int,
      deltaFiles: Int, uncommittedFiles: Int, bits: Int,
      colX: String, colY: String, trained: Boolean)

  def describe(spark: SparkSession, outDir: String): LayoutStats = {
    val m = readMeta(spark, outDir)
    val fs = fsOf(spark, outDir)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    val (delta, base) = names.partition(n => "^d(\\d+)-".r.findFirstMatchIn(n).nonEmpty)
    val (live, orphan) = delta.partition(n =>
      "^d(\\d+)-".r.findFirstMatchIn(n).exists(_.group(1).toInt <= m.epoch))
    LayoutStats(m.epoch, base.length, live.length, orphan.length,
      m.bits, m.colX, m.colY, m.splitsX.nonEmpty)
  }

  /** Delta files (`d<K>-*`) above the committed epoch — a crashed
    * append's leftovers, removed before any verb commits a reused epoch
    * number.
    */
  private def clearUncommittedFiles(spark: SparkSession, outDir: String,
      committed: Int): Unit = {
    val fs = fsOf(spark, outDir)
    val root = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(p => "^d(\\d+)-".r.findFirstMatchIn(p.getName)
          .exists(_.group(1).toInt > committed))
        .foreach(f => require(fs.delete(f, false), s"could not clear $f"))
  }

  /** OPTIMIZE: rewrite the whole table into `destDir` as a fresh
    * [[write]] — new boundaries absorb the appended deltas' distribution
    * drift and the file count re-bounds. The result is a NEW table
    * version; making it current is the caller's metastore pointer swap
    * (the only atomic multi-file replace plain parquet offers — exactly
    * how table formats run OPTIMIZE into fresh files + a manifest flip).
    */
  def recluster(spark: SparkSession, srcDir: String, destDir: String,
      bits: Int = 8, numFiles: Int = 16): Unit = {
    val m = readMeta(spark, srcDir)
    // roll back a crashed append's uncommitted d<K>-* leftovers BEFORE the
    // full-table read — every epoch-advancing verb does; without it a torn
    // delta would be baked permanently into the new table version instead
    // of being cleared by the append's retry
    clearUncommittedFiles(spark, srcDir, m.epoch)
    clearDirsAbove(spark, metaRoot(srcDir), m.epoch)
    write(spark, read(spark, srcDir), destDir, m.colX, m.colY,
      bits, numFiles)
  }

  /** Baseline for the pruning comparison: the SAME data linear-sorted by
    * one column — tight stats on colX, useless stats on everything else.
    */
  def writeLinear(spark: SparkSession, df: DataFrame, outDir: String,
      colX: String, numFiles: Int = 16): Unit =
    df.repartitionByRange(numFiles, col(colX))
      .sortWithinPartitions(colX)
      .write.mode("overwrite").parquet(outDir)

  import graft.Canon._

  /** Catalog row: z-order a lineitem copy on (l_extendedprice,
    * l_orderkey), answer a 2-D box aggregation from it — ORACLE-EXACT
    * against the same SELECT over the original table (the layout must
    * never change answers, only the bytes a scan touches;
    * ZOrderLayoutSpec asserts the row-group skipping itself via scan
    * metrics). The orderkey bound is a FRACTION of the table's max —
    * `floor(max · 0.2)` on both engines — so the box keeps the same ~2%
    * selectivity at every scale factor instead of degenerating to empty
    * or to the whole table.
    */
  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_layout_zorder",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_quantity")
        val d = java.nio.file.Files
          .createTempDirectory("graft_zorder").toString
        try {
          write(s, li, d, "l_extendedprice", "l_orderkey")
          // max() over an EMPTY slice is null — degenerate to bound 0
          // (the filter then matches nothing, like the oracle's empty
          // scalar subquery comparison)
          val mr = li.agg(max("l_orderkey")).head
          val okBound =
            if (mr.isNullAt(0)) 0L else math.floor(mr.getLong(0) * 0.2).toLong
          read(s, d) // the committed-epoch gate (≡ plain read here: epoch 0)
            .filter(col("l_extendedprice").between(10000, 20000) &&
              col("l_orderkey") <= okBound)
            .groupBy("l_suppkey")
            .agg(count(lit(1)).as("n"),
              r4(sum(col("l_extendedprice").cast("decimal(28,10)"))
                .cast("double")).as("price_sum"))
            .orderBy("l_suppkey")
            .localCheckpoint() // pin the bounded result off the temp files
        } finally org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(d))
      },
      Some("""SELECT l_suppkey, count(*) AS n,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 4) AS price_sum
             FROM lineitem
             WHERE l_extendedprice BETWEEN 10000 AND 20000
               AND l_orderkey <= (SELECT CAST(floor(max(l_orderkey) * 0.2) AS BIGINT) FROM lineitem)
             GROUP BY l_suppkey ORDER BY l_suppkey""")))
}
