package graft.queries

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF corpus layout made PHYSICAL: the claim `knnGraphIvf` and
  * `VectorIndex` state in prose — "at 100 TB the corpus is
  * partitioned/bucketed by cell, so a query touches 1/N of the data" —
  * as an on-disk contract a plan can prove.
  *
  * [[write]] trains the coarse quantizer, tags every vector with its ONE
  * nearest cell (the IVF posting-list membership — vectors live in one
  * cell; QUERIES probe several), and writes Hive-partitioned parquet
  * (`cell=<id>/...`) plus the pinned centroid table under `_index/`. The
  * write repartitions by cell first, so each posting list is one file —
  * at 100 TB the same layout comes from the table's partition spec and
  * the file count per cell follows data volume, but the pruning contract
  * is identical.
  *
  * [[prunedTopK]] is the search path the layout exists for: the query
  * batch (broadcast-contract small) resolves its top-`nprobe` cells
  * driver-side against the centroid table — a bounded k·dim-scale
  * collect, the same budget class as the quantizer itself — and the cell
  * set becomes a STATIC `isin` partition filter, so pruning happens in
  * the file index at planning time (PartitionFilters, numFiles), never
  * as a post-scan filter over the corpus. IndexedLayoutSpec asserts the
  * executed scan read exactly the probed cells' files and that the
  * result is row-identical to the same search over the unpartitioned
  * frame.
  */
object IndexedLayout {

  private def indexDir(outDir: String) = s"$outDir/_index/centroids"

  private def metaDir(outDir: String) = s"$outDir/_index/meta"

  /** Same commit-point discipline as KnnGraphBuild: the marker file, not
    * parquet's committer-dependent `_SUCCESS`, flips an epoch live.
    */
  import EpochStore.{CommitMarker, clearDirsAbove, committedEpochs,
    dropEpochDirs, fsOf}

  private def writeMeta(spark: SparkSession, outDir: String,
      epoch: Int, maxVecId: Long): Unit = {
    val p = s"${metaDir(outDir)}/e$epoch"
    // driver-side single-row write (MetaIO): no Spark job per verb
    MetaIO.writeRow(spark, p, "epoch" -> epoch, "max_vec_id" -> maxVecId)
    val marker = new org.apache.hadoop.fs.Path(p, CommitMarker)
    fsOf(spark, p).create(marker, true).close()
  }

  /** (epoch, high-water vec_id) of the newest COMMITTED epoch. */
  private def readMeta(spark: SparkSession, outDir: String): (Int, Long) = {
    val e = committedEpochs(spark, metaDir(outDir), "layout").max
    (e, MetaIO.readHead(spark, s"${metaDir(outDir)}/e$e").getLong("max_vec_id"))
  }

  /** File-name epoch of a cell file: `e<K>-*` (a delta's rows) or
    * `e<K>c-*` (a compaction's rewrite) — the InvertedIndex naming.
    */
  private def fileEpoch(name: String): Option[Int] =
    "^e(\\d+)c?-".r.findFirstMatchIn(name).map(_.group(1).toInt)

  /** Roll back UNCOMMITTED leftovers (cell files and tombstone dirs whose
    * epoch exceeds the committed one — a crashed delta's promoted files,
    * a crashed compaction's staged copies, a crashed delete's never-
    * committed tombstones). Every epoch-advancing verb calls this first,
    * so an abandoned crash can never be resurrected by a LATER commit
    * reusing its epoch number; a retry of the same verb simply re-stages
    * what it cleared. Safe by construction: files above the committed
    * epoch are invisible to readers (the `epoch <= committed` read
    * filter), and a pre-commit compaction never dropped an original, so
    * nothing live is ever removed. The [[InvertedIndex.clearUncommitted]]
    * discipline, verbatim in semantics.
    */
  private def clearUncommitted(spark: SparkSession, outDir: String,
      committed: Int): Unit = {
    val fs = fsOf(spark, outDir)
    val root = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith("cell=")).foreach { cdir =>
          fs.listStatus(cdir).map(_.getPath)
            .filter(f => fileEpoch(f.getName).exists(_ > committed))
            .foreach(f => require(fs.delete(f, false), s"could not clear $f"))
        }
    clearDirsAbove(spark, tombDir(outDir), committed)
  }

  private def tombDir(outDir: String) = s"$outDir/_index/tombstones"

  private def floorDir(outDir: String) = s"$outDir/_index/floor"

  /** Oldest epoch a time-travel read can faithfully reconstruct: 0 for a
    * never-compacted layout, else the newest compaction epoch —
    * compaction re-stamps survivors and drops satisfied tombstones, so
    * older snapshots are physically gone (the Delta VACUUM contract).
    * Raise/read mechanics are [[EpochStore]]'s shared floor walk.
    */
  def historyFloor(spark: SparkSession, outDir: String): Int =
    EpochStore.historyFloor(spark, floorDir(outDir))

  /** Train (or accept) the quantizer, assign one cell per vector, write
    * the cell-partitioned corpus + the pinned centroid table. Returns the
    * number of cells written. Every data row carries its WRITE EPOCH —
    * the column tombstone semantics hang on ([[readCorpus]]): a tombstone
    * (vec_id, as_of) kills exactly the rows of that id written BEFORE
    * `as_of`, so an upsert's fresh row (epoch = as_of) survives its own
    * tombstone.
    */
  def write(spark: SparkSession, embeddings: DataFrame, outDir: String,
      kCells: Int = 0, iters: Int = 2,
      centroidsOverride: DataFrame = null): Int = {
    import graft.functions.VectorIndex
    val e = embeddings.select("vec_id", "embedding")
    val sigs = VectorQueries.nrmFrame(e).localCheckpoint()
    val centroids =
      if (centroidsOverride != null) centroidsOverride
      else {
        val n = e.count()
        val k = if (kCells > 0) kCells else VectorQueries.ivfCellCount(n)
        VectorIndex.kmeansCentroids(spark,
          VectorQueries.trainFrame(sigs, n, k), k, iters)
      }
    // nprobe=1: posting-list membership is the single nearest cell
    val assigned = VectorQueries.ivfAssign(sigs, centroids, nprobe = 1)
    sigs.join(assigned.select("vec_id", "cell"), "vec_id")
      .withColumn("epoch", lit(0))
      .repartition(col("cell")) // one shuffle → one file per posting list here
      .write.mode("overwrite").partitionBy("cell").parquet(outDir)
    centroids.write.mode("overwrite").parquet(indexDir(outDir))
    val maxRow = sigs.agg(max("vec_id")).head
    writeMeta(spark, outDir, epoch = 0,
      maxVecId = if (maxRow.isNullAt(0)) Long.MinValue else maxRow.getLong(0))
    centroids.count().toInt
  }

  /** The pinned quantizer of a written layout. */
  def readCentroids(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(indexDir(outDir))

  /** Append a delta under the PINNED quantizer — the layout's steady-state
    * write path at 100 TB (VectorSync upserts landing as new posting-list
    * files): each new vector is assigned its single nearest cell against
    * the STORED centroids (never retrained — the same FAISS add()
    * contract as KnnGraphBuild.deltaIvf); only the touched cells gain
    * files, nothing existing is rewritten.
    *
    * CRASH SAFETY (the KnnGraphBuild discipline adapted to a layout plain
    * parquet readers scan): the append-only contract checks against the
    * META high-water mark — an O(1) read, never a scan of the layout, and
    * a value that only advances at commit, so a crashed attempt can always
    * be RETRIED (the stored hwm still precedes the delta). The delta
    * writes to a staging dir under `_index/` (invisible to readers), its
    * files then move into the live cell dirs under DETERMINISTIC
    * epoch-prefixed names — a retry of the same epoch overwrites the same
    * names instead of duplicating rows (the EventLogSource idempotent-
    * naming standard) — and the meta epoch commits last. Readers filter
    * `epoch <= committed` ([[readCorpus]]), so a crashed, not-yet-retried
    * attempt's promoted files are INVISIBLE — no torn-delta read window —
    * and the retry converges the layout exactly.
    * Enforces the append-only id contract loudly; a no-op on an empty
    * delta. Returns rows appended.
    */
  def append(spark: SparkSession, newVecs: DataFrame, outDir: String): Long = {
    val ids = newVecs.select("vec_id")
    val minRow = ids.agg(min("vec_id")).head
    if (minRow.isNullAt(0)) return 0L
    val (_, hwm) = readMeta(spark, outDir)
    require(minRow.getLong(0) > hwm,
      s"append vec_ids must sort after every id in the layout " +
        s"(append-only contract): new min ${minRow.getLong(0)} <= stored " +
        s"high-water mark $hwm")
    applyDelta(spark, newVecs, newVecs.limit(0).select("vec_id"), outDir)._1
  }

  /** Upsert: replace (or add) each incoming vector under the pinned
    * quantizer. Ids at or below the high-water mark are tombstoned in the
    * same epoch their fresh row lands, so the old copy dies exactly when
    * the new one becomes visible; brand-new ids skip the tombstone
    * (nothing to kill — keeps tombstone growth proportional to CHURN, not
    * ingest). Returns rows upserted.
    */
  def upsert(spark: SparkSession, vecs: DataFrame, outDir: String): Long =
    applyDelta(spark, vecs, vecs.limit(0).select("vec_id"), outDir)._1

  /** Delete vectors from the layout by tombstone — no data file is touched;
    * [[readCorpus]]/[[prunedTopK]] anti-join the dead set. Deleting an id
    * that is not live is a harmless no-op record (the downstream-store
    * convention — the reference's delete path is fire-and-forget,
    * debounce.go:104-121), so CDC replays never fail here. Returns ids
    * tombstoned.
    */
  def delete(spark: SparkSession, ids: DataFrame, outDir: String): Long =
    applyDelta(spark, ids.limit(0).selectExpr("vec_id",
      "cast(array() as array<float>) as embedding"), ids, outDir)._2

  /** One epoch of CDC against the layout: tombstone `deleteIds` plus the
    * superseded copies of `upserts`, land the fresh upsert rows in their
    * cells under the PINNED quantizer. The upsert/delete split is the
    * pipeline's A16 contract (payload partition) applied to the index
    * itself. Returns (rows upserted, ids tombstoned).
    *
    * CRASH SAFETY extends the append discipline: every uncommitted
    * leftover of a crashed earlier attempt (promoted files or tombstone
    * dirs above the committed epoch) rolls back FIRST
    * ([[clearUncommitted]]), so committing `next` can never resurrect an
    * abandoned verb's state; tombstones then write to their epoch dir
    * BEFORE the commit (invisible — readers resolve tombstones only up to
    * the committed meta epoch); data files stage under `_index/` and
    * promote under deterministic `e<N>-<i>` names (equally invisible
    * until the commit, via the `epoch <= committed` read filter). The
    * meta epoch commits last and flips tombstones + data live TOGETHER.
    * Re-applying an ALREADY-COMMITTED epoch (a CDC replay that lost its
    * marker) is semantically idempotent too: the replay's tombstones
    * carry a newer as_of and kill the previous application's rows, so
    * exactly one live copy survives.
    */
  def applyDelta(spark: SparkSession, upserts: DataFrame,
      deleteIds: DataFrame, outDir: String): (Long, Long) = {
    import spark.implicits._
    val sigs = VectorQueries.nrmFrame(upserts.select("vec_id", "embedding"))
      .localCheckpoint()
    val nUp = sigs.count()
    val (epoch, hwm) = readMeta(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val next = epoch + 1
    // tombstone = explicit deletes ∪ upserts that supersede a stored copy
    val tombs = deleteIds.select("vec_id")
      .union(sigs.select("vec_id").filter(col("vec_id") <= hwm))
      .distinct().localCheckpoint()
    val nTomb = tombs.count()
    if (nUp == 0 && nTomb == 0) return (0L, 0L)
    val fs = fsOf(spark, outDir)
    if (nTomb > 0)
      tombs.withColumn("as_of", lit(next))
        .coalesce(1).write.mode("overwrite").parquet(s"${tombDir(outDir)}/e$next")
    if (nUp > 0) {
      val staging = s"$outDir/_index/staging/e$next"
      val assigned = VectorQueries.ivfAssign(
        sigs, readCentroids(spark, outDir), nprobe = 1)
      sigs.join(assigned.select("vec_id", "cell"), "vec_id")
        .withColumn("epoch", lit(next))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(staging)
      // promote: per cell, staging files (name-sorted — Spark's part
      // numbers, deterministic for a deterministic shuffle) land as
      // e<N>-<i>.parquet (no e<N>-* survivors can exist — clearUncommitted
      // above removed any crashed attempt's)
      val stagingPath = new org.apache.hadoop.fs.Path(staging)
      fs.listStatus(stagingPath).map(_.getPath)
        .filter(_.getName.startsWith("cell="))
        .foreach { cellDir =>
          val target = new org.apache.hadoop.fs.Path(outDir, cellDir.getName)
          fs.mkdirs(target)
          fs.listStatus(cellDir).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
            .zipWithIndex.foreach { case (f, i) =>
              val dest = new org.apache.hadoop.fs.Path(target, s"e$next-$i.parquet")
              require(fs.rename(f, dest), s"could not promote $f to $dest")
            }
        }
      val maxNew = sigs.agg(max("vec_id")).head.getLong(0)
      writeMeta(spark, outDir, next, math.max(hwm, maxNew)) // the commit point
      fs.delete(stagingPath, true)
    } else {
      writeMeta(spark, outDir, next, hwm) // delete-only epoch: hwm unchanged
    }
    (nUp, nTomb)
  }

  /** (vec_id → latest as_of) of every tombstone visible at the committed
    * epoch, or None when the layout has never seen a delete/upsert — the
    * fast path keeps tombstone-free plans (and their partition-pruning
    * proof) byte-identical to the pre-tombstone layout.
    */
  private def readTombstones(spark: SparkSession, outDir: String,
      epoch: Int): Option[DataFrame] = {
    val fs = fsOf(spark, outDir)
    val dirs = (1 to epoch).map(i => s"${tombDir(outDir)}/e$i")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*)
      .groupBy("vec_id").agg(max("as_of").as("as_of")))
  }

  /** The LIVE corpus: the raw cell-partitioned scan with tombstones
    * resolved — a row survives unless a tombstone for its id carries a
    * LATER epoch than the row's write epoch. The tombstone side is
    * churn-sized (never corpus-sized) and joins on vec_id; at 100 TB the
    * steady-state answer to unbounded churn is compaction — rewrite the
    * cells whose dead fraction crosses a threshold and drop their
    * satisfied tombstones — which this layout's per-cell file structure
    * localizes to the churned posting lists.
    *
    * `asOf` ≥ 0 is TIME TRAVEL: the snapshot as of that committed epoch —
    * rows written at epoch ≤ asOf, killed only by tombstones with
    * as_of ≤ asOf. Epochs ARE the layout's version history (every CDC
    * verb lands as a new epoch's files + tombstones; nothing before this
    * needed changing), so a snapshot read is two monotone filters. The
    * LIVE read is the same gate at the committed epoch: a crashed
    * delta's promoted-but-uncommitted rows are INVISIBLE (no phantom
    * adds, no both-copies-of-an-update window — the
    * [[InvertedIndex.readPostings]] discipline; the predicate is a
    * pushed data filter, so the partition-pruning proofs are unchanged).
    * HISTORY FLOOR: `compact` re-stamps survivors to its own
    * epoch and drops satisfied tombstones, so older snapshots are
    * physically unreconstructable; `asOf` below [[historyFloor]] CLAMPS
    * to the floor (never a silently incomplete view) — exactly the Delta
    * Lake VACUUM contract (time travel reaches back to the last physical
    * cleanup, never past it).
    */
  def readCorpus(spark: SparkSession, outDir: String,
      asOf: Int = -1): DataFrame = {
    val (epoch, _) = readMeta(spark, outDir)
    // the floor lookup (an fs listing) is paid only on snapshot reads
    val cut = if (asOf < 0 || asOf >= epoch) epoch
      else math.min(epoch, math.max(asOf, historyFloor(spark, outDir)))
    val base = spark.read.parquet(outDir).filter(col("epoch") <= cut)
    readTombstones(spark, outDir, cut) match {
      case None => base
      case Some(t) =>
        base.join(t, Seq("vec_id"), "left")
          .filter(col("as_of").isNull || col("epoch") >= col("as_of"))
          .drop("as_of")
    }
  }

  /** CHANGE-DATA-FEED between two committed epochs — the Delta CDF verb,
    * derived from the epoch history the layout already keeps (no change
    * journal to maintain): `upsert` rows are the ids LIVE at `to` whose
    * current version landed after `from` (new ids and replaced values —
    * net semantics: an id upserted twice in the window emits once, with
    * its final value; added-then-deleted emits nothing), `delete` rows
    * are the ids live at `from` and gone at `to` (embedding null). Each
    * side is one snapshot read plus a churn-sized filter/anti-join, so a
    * downstream consumer syncs INCREMENTALLY — the diff is
    * change-proportional, never corpus-proportional, which is the whole
    * point at 100 TB.
    *
    * `from` must be at or above [[historyFloor]]: compaction re-stamps
    * survivors to its own epoch, so a diff across a compaction boundary
    * would emit the whole corpus as fake upserts — that request fails
    * loudly instead of answering wrong (the clamp that is safe for
    * snapshot READS is not safe for diffs).
    */
  def changesBetween(spark: SparkSession, outDir: String,
      from: Int, to: Int): DataFrame = {
    val (epoch, _) = readMeta(spark, outDir)
    val floor = historyFloor(spark, outDir)
    require(from <= to, s"changesBetween: from=$from > to=$to")
    require(to <= epoch, s"changesBetween: to=$to exceeds committed epoch $epoch")
    require(from >= floor,
      s"changesBetween: from=$from predates the history floor $floor — " +
        "compaction dropped the versions this diff would need")
    val before = readCorpus(spark, outDir, asOf = from)
    val after = readCorpus(spark, outDir, asOf = to)
    val upserts = after.filter(col("epoch") > from)
      .select(lit("upsert").as("change"), col("vec_id"), col("embedding"))
    val deletes = before.select("vec_id")
      .join(after.select("vec_id"), Seq("vec_id"), "left_anti")
      .select(lit("delete").as("change"), col("vec_id"))
    upserts.unionByName(deletes, allowMissingColumns = true)
  }

  /** Compact the layout: rewrite cells holding tombstone-killed rows down
    * to their live sets and drop the then-satisfied tombstones — the LSM
    * lifecycle's last verb, and the steady-state answer to unbounded
    * churn the tombstone scaladocs promise. Work is bounded by the
    * CHURNED cells, never the corpus: a vec_id's rows live in exactly one
    * cell under the pinned quantizer, so the dirty-cell set (a bounded
    * driver collect of per-cell stats, ≤ |cells| rows) covers every dead
    * row, and clean cells' files are never touched (spec-asserted by
    * file name).
    *
    * `minDeadFrac` is the compaction POLICY knob: only cells whose dead
    * fraction (dead rows / total rows on disk) reaches the threshold are
    * rewritten — the RocksDB/LSM space-amp trigger, keeping rewrite I/O
    * proportional to reclaimable space instead of churn incidence. The
    * default 0.0 compacts every dirty cell (the full-repair verb). When
    * cells stay below the threshold, their tombstones must outlive the
    * pass: the still-needed subset (those killing a row in an
    * un-compacted cell) is consolidated into the compaction epoch's own
    * tombstone dir — original `as_of` values preserved, so reader
    * semantics are unchanged — and only the pre-compaction dirs drop.
    *
    * CRASH SAFETY — the [[InvertedIndex.compact]] two-phase protocol,
    * now shared verbatim in semantics (round 12 proved it on the lexical
    * side; round 13 retired the cell layout's promote-then-drop original):
    *
    *   - TWO-PHASE: the meta commit happens BEFORE any original file is
    *     dropped. Pre-commit, the rewritten copies (named `e<next>c-*`,
    *     epoch column = next) are invisible to readers (the committed-
    *     epoch filter) and every original is intact, so a crash there
    *     loses nothing and [[clearUncommitted]] rolls the copies back;
    *     post-commit, a crash can only leave superseded originals beside
    *     their committed copies — readers briefly see duplicates (the
    *     torn caveat) and the next compact converges them (the staging
    *     input keeps ONE row per vec_id, max write epoch).
    *   - The dirty set bypasses `minDeadFrac` for any cell showing
    *     torn-state evidence: duplicate vec_ids among the LIVE rows —
    *     the post-commit crash's signature, whose dilution of the dead
    *     fraction would otherwise let the policy skip the damaged cell
    *     forever (and prunedTopK serve the same vec_id at two ranks
    *     indefinitely). An ordinary update's dead-but-on-disk old copy
    *     is NOT live, so update churn never trips this — the policy knob
    *     stays meaningful.
    *
    * A fully-dead cell (every row tombstoned) stages nothing and simply
    * drops its files in phase 2. Consolidated survivor tombstones write
    * BEFORE the meta commit (invisible until it). Single-writer, like
    * every other layout mutation. Returns (cells compacted, live rows
    * rewritten).
    */
  def compact(spark: SparkSession, outDir: String,
      minDeadFrac: Double = 0.0): (Int, Long) = {
    val (epoch, hwm) = readMeta(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val fs = fsOf(spark, outDir)
    def dropTombstones(): Unit =
      dropEpochDirs(spark, tombDir(outDir), 1, epoch)
    val tombsOpt = readTombstones(spark, outDir, epoch)
    val raw = spark.read.parquet(outDir)
    val deadRows = tombsOpt match {
      case None => raw.limit(0).withColumn("as_of", lit(0))
      case Some(t) => raw.join(t, Seq("vec_id"))
        .filter(col("epoch") < col("as_of"))
    }
    def liveOf(rows: DataFrame): DataFrame = tombsOpt match {
      case None => rows
      case Some(t) => rows.join(t, Seq("vec_id"), "left")
        .filter(col("as_of").isNull || col("epoch") >= col("as_of"))
        .drop("as_of")
    }
    // per-cell (dead, total, duplicate-evidence) stats — the bounded
    // driver view the policy decides on (≤ |cells| rows, the centroid-
    // table budget class). Torn evidence is duplicate vec_ids among the
    // LIVE rows only (a vec_id lives in exactly one cell under the
    // pinned quantizer, so live dups can only be a post-commit-crashed
    // compact's original + committed copy); an update's dead old copy is
    // exactly the mass minDeadFrac meters, never torn evidence.
    val liveDups = liveOf(raw)
      .groupBy("cell")
      .agg((count(lit(1)) > countDistinct(col("vec_id"))).as("torn"))
    val stats = raw.groupBy("cell")
      .agg(count(lit(1)).as("total"))
      .join(deadRows.groupBy("cell").agg(count(lit(1)).as("dead")),
        Seq("cell"), "left")
      .join(liveDups, Seq("cell"), "left")
      .select(col("cell"),
        (coalesce(col("dead"), lit(0L)).cast("double") / col("total")).as("frac"),
        coalesce(col("torn"), lit(false)).as("torn"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(2)))
    val torn = stats.filter(_._3).map(_._1).toSet
    val dirtyStats = stats.filter(s => s._2 > 0.0 || torn(s._1))
    if (dirtyStats.isEmpty) {
      // nothing dead on disk (unknown-id deletes, or a crashed attempt
      // that finished every cell): every tombstone is satisfied — rows
      // only ever land with epochs NEWER than any existing as_of, so a
      // tombstone that kills nothing today can never kill anything again
      if (tombsOpt.nonEmpty) dropTombstones()
      return (0, 0L)
    }
    val dirty = dirtyStats
      .filter(s => s._2 >= minDeadFrac || torn(s._1)).map(_._1).sorted
    // every dirty cell is below the policy threshold: reclaimable space
    // does not yet justify a rewrite, and the tombstones are still doing
    // their job — leave everything in place
    if (dirty.isEmpty) return (0, 0L)
    val next = epoch + 1
    // tombstones that must OUTLIVE this pass: those still killing a row
    // in a cell the threshold left un-compacted (pinned before any file
    // mutation below)
    val survivorTombs =
      if (tombsOpt.isEmpty || dirty.length == dirtyStats.length) None
      else Some(deadRows
        .filter(!col("cell").isin(dirty.map(c => c: Any): _*))
        .select("vec_id", "as_of").distinct().localCheckpoint())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("epoch").desc)
    val input = liveOf(raw.filter(col("epoch") <= epoch))
      .filter(col("cell").isin(dirty.map(c => c: Any): _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("epoch", lit(next))
      .localCheckpoint()
    val rewritten = input.count()
    val staging = s"$outDir/_index/staging/e$next"
    input.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val staged = fs.listStatus(stagingPath).map(_.getPath)
      .filter(_.getName.startsWith("cell=")).map(p => p.getName -> p).toMap
    // phase 1: promote copies (c-namespace) — originals untouched
    dirty.foreach { cell =>
      val name = s"cell=$cell"
      val target = new org.apache.hadoop.fs.Path(outDir, name)
      staged.get(name).foreach { cellDir =>
        fs.listStatus(cellDir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .zipWithIndex.foreach { case (f, i) =>
            val dest = new org.apache.hadoop.fs.Path(target, s"e${next}c-$i.parquet")
            require(fs.rename(f, dest), s"could not promote $f to $dest")
          }
      }
    }
    // consolidated survivors land in the compaction epoch's own dir —
    // invisible until the commit below makes epoch `next` current
    survivorTombs.filter(s => !s.isEmpty).foreach(_.coalesce(1)
      .write.mode("overwrite").parquet(s"${tombDir(outDir)}/e$next"))
    // floor BEFORE the commit: a crash between the two over-clamps time
    // travel (snapshots < next unavailable) but never exposes a snapshot
    // this pass is making unreconstructable
    EpochStore.raiseFloor(spark, floorDir(outDir), next)
    writeMeta(spark, outDir, next, hwm) // the commit point
    // phase 2: drop the superseded originals (for a fully-dead cell:
    // everything), then the satisfied pre-compaction tombstone dirs
    dirty.foreach { cell =>
      val target = new org.apache.hadoop.fs.Path(outDir, s"cell=$cell")
      fs.listStatus(target).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith(s"e${next}c-"))
        .foreach(f => require(fs.delete(f, false), s"could not drop $f"))
    }
    dropTombstones() // pre-compaction dirs only (1..epoch); e`next` survives
    fs.delete(stagingPath, true)
    (dirty.length, rewritten)
  }

  /** Store-level statistics of a layout — the introspection surface an
    * index store exposes (FAISS's ntotal / Lucene's segment stats): all
    * fields are bounded aggregations (count jobs with scalar outputs),
    * never row dumps. `deadRows` > 0 quantifies the reclaimable space
    * [[compact]]'s `minDeadFrac` policy meters.
    */
  final case class LayoutStats(epoch: Int, floor: Int, maxVecId: Long,
      cells: Long, rowsOnDisk: Long, liveRows: Long, deadRows: Long,
      tombstonedIds: Long)

  def describe(spark: SparkSession, outDir: String): LayoutStats = {
    val (epoch, hwm) = readMeta(spark, outDir)
    val raw = spark.read.parquet(outDir).filter(col("epoch") <= epoch)
    val r = raw.agg(count(lit(1)).as("n"),
      countDistinct(col("cell")).as("c")).head
    val live = readCorpus(spark, outDir).count()
    val tombs = readTombstones(spark, outDir, epoch)
      .map(_.count()).getOrElse(0L)
    LayoutStats(epoch, historyFloor(spark, outDir), hwm,
      r.getLong(1), r.getLong(0), live, r.getLong(0) - live, tombs)
  }

  /** The (q_id, cell) probe set for a query frame (q_id, q_emb): each
    * query's top-`nprobe` cells by centroid cosine. Deterministic in the
    * centroid table (ties → lowest cell).
    */
  def probeCells(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame =
    // one copy of the assignment semantics: rename into ivfAssign's
    // (vec_id, embedding) contract and back — the incremental-exactness
    // story depends on every path assigning identically
    VectorQueries.ivfAssign(
      VectorQueries.nrmFrame(queries
        .select(col("q_id").as("vec_id"), col("q_emb").as("embedding"))),
      centroids, nprobe)
      .select(col("vec_id").as("q_id"), col("cell"), col("sim"))

  /** Top-`k` cosine neighbors per query over the cell-partitioned layout,
    * reading ONLY the probed cells' files. The scan is handed a STATIC
    * cell list (collected from the bounded probe frame), so Spark prunes
    * partition directories at planning time — the physical payoff of the
    * layout. Per-query restriction then rides the (q_id, cell) join: a
    * query only scores vectors in its own probed cells, exactly the
    * logical IVF search.
    *
    * `allowedIds` (optional, a vec_id frame) is the FILTERED-ANN verb on
    * the physical path: candidates are restricted to the allowed set
    * BEFORE ranking (every returned neighbor satisfies the filter — the
    * q_sim_topk_filtered semantics), composed as a semi-join on the
    * pruned scan exactly like the tombstone liveness join, so partition
    * pruning and the metadata filter stack rather than trade off.
    */
  def prunedTopK(spark: SparkSession, outDir: String, queries: DataFrame,
      k: Int, nprobe: Int, maxFallbackFrac: Double = -1.0,
      allowedIds: DataFrame = null, asOf: Int = -1): DataFrame = {
    val centroids = readCentroids(spark, outDir)
    val probes0 = probeCells(queries, centroids, nprobe).localCheckpoint()
    // the SAME confidence fallback + cap as ivfTopK (one implementation —
    // VectorQueries.ivfFallbackGuard): a query orthogonal to every
    // centroid widens its probe set to ALL cells (exact scan of the
    // layout), and a batch over the cap fails loudly instead of silently
    // degrading the prune
    val fbIds = VectorQueries.ivfFallbackGuard(spark,
      probes0.groupBy("q_id").agg(max("sim").as("best")), maxFallbackFrac)
    val probes =
      if (fbIds.isEmpty) probes0
      else probes0.filter(!col("q_id").isin(fbIds.toSeq: _*))
        .unionByName(
          probes0.select("q_id").distinct()
            .filter(col("q_id").isin(fbIds.toSeq: _*))
            .crossJoin(centroids.select("cell"))
            .withColumn("sim", lit(0.0)))
        .localCheckpoint()
    // bounded driver collect: |queries| · nprobe cells, the query side is
    // broadcast-contract small (same class as the centroid table itself)
    val cellSet = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    // tombstones resolve on the LIVE (or asOf-snapshot) read; the static
    // cell filter still reaches the scan through the tombstone join
    // (left-side predicate). The quantizer is PINNED index state, so a
    // snapshot search probes the same cells as it did at that epoch.
    val live = readCorpus(spark, outDir, asOf)
      .filter(col("cell").isin(cellSet.map(c => c: Any): _*))
    val corpus =
      if (allowedIds == null) live
      else live.join(allowedIds.select("vec_id"), Seq("vec_id"), "left_semi")
    val q = broadcast(queries
      .select(col("q_id"), col("q_emb"), l2Norm(col("q_emb")).as("q_n"))
      .join(probes, "q_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    q.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(cosineWithNorms(
        col("q_emb").cast("array<double>"), col("embedding").cast("array<double>"),
        col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        graft.Canon.r4(col("cos_r")).as("cos"))
      .orderBy("q_id", "rnk")
  }
}
