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
}
