package graft.queries

import org.apache.spark.sql.SparkSession

/** The primitives of the shared epoch-dir commit protocol that
  * [[IndexedLayout]], [[InvertedIndex]], and [[MatView]] all follow (data
  * dirs land first, the meta epoch's commit marker last; anything above
  * the committed epoch is an orphan the next verb rolls back). The
  * store-specific VERBS stay in each store — their rollback scopes and
  * liveness rules genuinely differ — but the constants and parsers they
  * hang on live once, so a fix to the protocol's primitives cannot be
  * applied to two stores and forgotten in the third.
  */
private[graft] object EpochStore {
  /** The per-epoch meta commit marker file name. */
  val CommitMarker = "_graft_committed"

  def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Epoch of a per-epoch DIR name (`e<K>`); None for anything else — a
    * stray dir named just `e` (or with a non-numeric tail) must be
    * ignored, never crash the parse.
    */
  def dirEpoch(name: String): Option[Int] =
    if (name.length > 1 && name.startsWith("e") &&
      name.drop(1).forall(_.isDigit)) Some(name.drop(1).toInt)
    else None

  /** Epochs under a meta dir whose commit marker exists — the committed
    * history every store's readMeta derives its current epoch from.
    * Requires the dir to exist (a store that was never bootstrapped is a
    * caller error, reported with the caller's `what`).
    */
  def committedEpochs(spark: SparkSession, metaDir: String,
      what: String): Array[Int] = {
    val md = new org.apache.hadoop.fs.Path(metaDir)
    val fs = fsOf(spark, metaDir)
    require(fs.exists(md), s"no $what meta under $md")
    val epochs = fs.listStatus(md).map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker)))
      .flatMap(p => dirEpoch(p.getName))
    require(epochs.nonEmpty, s"no committed epoch under $md")
    epochs
  }

  /** Oldest epoch a time-travel read can faithfully reconstruct: 0 when
    * no floor marker exists, else the highest marker — compaction raises
    * it via [[raiseFloor]] BEFORE its meta commit, so a crash between the
    * two can only over-clamp (snapshots temporarily unavailable), never
    * expose a snapshot the compaction made unreconstructable.
    */
  def historyFloor(spark: SparkSession, floorDir: String): Int = {
    val d = new org.apache.hadoop.fs.Path(floorDir)
    val fs = fsOf(spark, floorDir)
    if (!fs.exists(d)) 0
    else {
      val es = fs.listStatus(d).map(_.getPath.getName).flatMap(dirEpoch)
      if (es.isEmpty) 0 else es.max
    }
  }

  /** Raise the history floor to `floor` — an empty marker file per raise,
    * highest wins (atomic create; no read-modify-write).
    */
  def raiseFloor(spark: SparkSession, floorDir: String, floor: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$floorDir/e$floor")
    fsOf(spark, floorDir).create(p, true).close()
  }

  /** Drop the per-epoch dirs `e<lo>`..`e<hi>` under `root` (absent ones
    * skipped, failures loud) — the satisfied-tombstone / superseded-dir
    * cleanup every compaction ends with.
    */
  def dropEpochDirs(spark: SparkSession, root: String, lo: Int,
      hi: Int): Unit = {
    val fs = fsOf(spark, root)
    (lo to hi).map(i => new org.apache.hadoop.fs.Path(s"$root/e$i"))
      .filter(fs.exists).foreach(p =>
        require(fs.delete(p, true), s"could not drop $p"))
  }

  /** Roll back per-epoch dirs ABOVE the committed epoch under `root` — a
    * crashed verb's uncommitted leftovers, which a later verb committing
    * the same epoch number must never resurrect. Safe by construction:
    * dirs above the committed epoch are invisible to every reader's
    * `epoch <= committed` gate.
    */
  def clearDirsAbove(spark: SparkSession, root: String,
      committed: Int): Unit = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, root)
    if (fs.exists(rp))
      fs.listStatus(rp).map(_.getPath)
        .filter(p => dirEpoch(p.getName).exists(_ > committed))
        .foreach(p => require(fs.delete(p, true), s"could not clear $p"))
  }
}
