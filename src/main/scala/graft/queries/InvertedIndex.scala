package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A PERSISTED INVERTED INDEX — the lexical twin of [[IndexedLayout]]'s
  * cell layout (the Lucene segment model re-expressed as a Spark physical
  * layout): postings (token, doc_id, tf) written Hive-partitioned by a
  * deterministic token-hash bucket, so a BM25 query prunes the scan to
  * its own tokens' buckets at PLANNING time — at 100 TB a k-token query
  * reads at most k/Buckets of the index, never the corpus. Document
  * lengths live beside the postings (`_index/dl`), corpus stats
  * (n_docs, Σdl) in the committed meta, and per-token document frequency
  * derives from the token's own posting list inside its pruned bucket —
  * df needs no global pass at query time.
  *
  * Deltas follow the layout's discipline exactly: an append stages its
  * postings, promotes them into the bucket dirs under epoch-prefixed
  * names (idempotent retry: the e\<N\>-* prefix clears first), and the
  * meta commit (marker file) flips the epoch live — readers filter
  * `epoch <= committed`, so a crashed append's leftovers are invisible.
  * Appends are disjoint from the LIVE doc set by contract (the
  * [[IndexedLayout.append]] contract); [[delete]] tombstones documents
  * with the layout's (doc_id, as_of) liveness semantics, so update =
  * delete + append and a re-added id's fresh postings survive the old
  * tombstone. The spec proves build+append ≡ one build over the union
  * and delete ≡ rebuild-over-survivors, bit-for-bit, because df/dl/stats
  * are sums over disjoint live doc sets.
  *
  * Reference analog: the engine's sync→index loop maintains the VECTOR
  * index (IndexSync); this is the same "index kept fresh beside the
  * corpus" story for the lexical retrieval path q_rank_bm25 serves
  * directly. Scoring is tree-identical to q_rank_bm25 (the shared
  * [[idfOf]]/[[termScore]] expressions), so the indexed search is
  * oracle-exact against the very same DuckDB SQL.
  */
object InvertedIndex {

  /** Token-hash fan-out of the posting lists. Fixed at write time (the
    * pinned-quantizer analog): queries compute the same bucket with the
    * same expression, so pruning is correct across sessions.
    */
  val Buckets = 16

  import EpochStore.{CommitMarker, clearDirsAbove, committedEpochs,
    dropEpochDirs, fsOf}
  private def metaDir(outDir: String) = s"$outDir/_index/meta"
  private def dlDir(outDir: String) = s"$outDir/_index/dl"
  private def delDir(outDir: String) = s"$outDir/_index/deleted"

  private[queries] def bucketOf(token: Column): Column =
    pmod(hash(token), lit(Buckets))

  /** File-name epoch of a bucket file: `e<K>-*` (an append's postings)
    * or `e<K>c-*` (a compaction's rewrite). */
  private def fileEpoch(name: String): Option[Int] = {
    val m = "^e(\\d+)c?-".r.findFirstMatchIn(name)
    m.map(_.group(1).toInt)
  }

  /** Roll back UNCOMMITTED leftovers (bucket files and dl dirs whose
    * epoch exceeds the committed one — a crashed append's promoted files
    * or a crashed compaction's staged copies). Every epoch-advancing verb
    * calls this first, so an abandoned crash can never be resurrected by
    * a LATER commit reusing its epoch number; a retry of the same verb
    * simply re-stages what it cleared. Safe by construction: files above
    * the committed epoch are invisible to readers (the `epoch <=
    * committed` read filter), and a pre-commit compaction never dropped
    * an original, so nothing live is ever removed.
    */
  private def clearUncommitted(spark: SparkSession, outDir: String,
      committed: Int): Unit = {
    val fs = fsOf(spark, outDir)
    val root = new org.apache.hadoop.fs.Path(outDir)
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith("bucket=")).foreach { bdir =>
          fs.listStatus(bdir).map(_.getPath)
            .filter(f => fileEpoch(f.getName).exists(_ > committed))
            .foreach(f => require(fs.delete(f, false), s"could not clear $f"))
        }
    // dl AND tombstone epoch dirs above the commit roll back too — a
    // crashed delete's never-committed tombstones must not go live when
    // a later verb commits the same epoch number (its stats never netted
    // the victims, so resurrection would also corrupt N/avgdl)
    clearDirsAbove(spark, dlDir(outDir), committed)
    clearDirsAbove(spark, delDir(outDir), committed)
  }

  /** Robertson/Lucene idf, never negative: ln(1 + (N−df+0.5)/(df+0.5)),
    * rounded to 6 — one fixed IEEE tree over integer inputs, shared by
    * the direct q_rank_bm25 and the indexed search so both produce
    * bit-identical doubles.
    */
  private[queries] def idfOf(nDocs: Column, df: Column): Column =
    round(log((nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5)) + lit(1.0)), 6)

  /** Per-(query-term, doc) BM25 contribution (k1 = 1.2, b = 0.75),
    * rounded to 6 then cast to exact DECIMAL for order-independent
    * summation — the q_hybrid_rrf determinism contract.
    */
  private[queries] def termScore(tf: Column, dl: Column, idf: Column,
      avgdl: Column): Column =
    round(idf * ((tf.cast("double") * lit(2.2)) /
      (tf.cast("double") + lit(1.2) * (lit(0.25) +
        (lit(0.75) * dl.cast("double")) / avgdl))), 6)
      .cast(DecimalType(18, 6))

  /** The deterministic stop-word cap shared with q_rank_bm25: drop
    * tokens present in more than 90 % of documents — the integer rule
    * that bounds posting-list joins regardless of corpus skew.
    */
  private[queries] def underStopCap(df: Column, nDocs: Column): Column =
    df * 10 <= nDocs * 9

  private def writeMeta(spark: SparkSession, outDir: String, epoch: Int,
      nDocs: Long, tokTotal: Long): Unit = {
    val p = s"${metaDir(outDir)}/e$epoch"
    // driver-side single-row write (MetaIO): no Spark job per verb
    MetaIO.writeRow(spark, p, "epoch" -> epoch, "n_docs" -> nDocs,
      "tok_total" -> tokTotal)
    val marker = new org.apache.hadoop.fs.Path(p, CommitMarker)
    fsOf(spark, p).create(marker, true).close()
  }

  /** (epoch, n_docs, Σdl) of the newest COMMITTED epoch. */
  def readMeta(spark: SparkSession, outDir: String): (Int, Long, Long) = {
    val e = committedEpochs(spark, metaDir(outDir), "index").max
    val r = MetaIO.readHead(spark, s"${metaDir(outDir)}/e$e")
    (e, r.getLong("n_docs"), r.getLong("tok_total"))
  }

  /** The (n_docs, Σdl) stats AS OF a committed epoch — old meta dirs are
    * retained per epoch, so a snapshot's scoring constants (N, avgdl)
    * read straight from its own commit.
    */
  private def readMetaAt(spark: SparkSession, outDir: String,
      e: Int): (Long, Long) = {
    val p = s"${metaDir(outDir)}/e$e"
    require(fsOf(spark, p).exists(
      new org.apache.hadoop.fs.Path(p, CommitMarker)),
      s"epoch $e was never committed under ${metaDir(outDir)}")
    val r = MetaIO.readHead(spark, p)
    (r.getLong("n_docs"), r.getLong("tok_total"))
  }

  private def floorDir(outDir: String) = s"$outDir/_index/floor"

  /** Oldest epoch a time-travel read can faithfully reconstruct: 0 for a
    * never-compacted index, else the newest compaction epoch (compaction
    * re-stamps postings/dl and drops satisfied tombstones — the history
    * behind it is physically gone, the Delta VACUUM contract).
    * Raise/read mechanics are [[EpochStore]]'s shared floor walk.
    */
  def historyFloor(spark: SparkSession, outDir: String): Int =
    EpochStore.historyFloor(spark, floorDir(outDir))

  /** Tokenize once; returns (postings tf frame, per-doc dl frame). */
  private def project(docs: DataFrame, epoch: Int): (DataFrame, DataFrame) = {
    import graft.functions.TextFunctions.tokens
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .localCheckpoint() // feeds tf AND dl — tokenize the corpus once
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketOf(col("token")))
      .withColumn("epoch", lit(epoch))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .withColumn("epoch", lit(epoch))
    (tf, dl)
  }

  /** Build the index over a corpus (epoch 0). Returns n_docs indexed. */
  def build(spark: SparkSession, docs: DataFrame, outDir: String): Long = {
    val (tf, dl) = project(docs.select("doc_id", "text"), epoch = 0)
    tf.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
    dl.write.mode("overwrite").parquet(s"${dlDir(outDir)}/e0")
    val s = dl.agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("t")).head
    writeMeta(spark, outDir, 0, s.getLong(0), s.getLong(1))
    s.getLong(0)
  }

  /** Absorb NEW documents (id-disjoint from the LIVE set — the
    * [[IndexedLayout.append]] contract; a tombstoned id may re-enter,
    * its fresh epoch outliving the tombstone) as a fresh epoch: staged write,
    * epoch-prefixed promote into the bucket dirs (retry clears its own
    * prefix first), dl + stats accumulate, meta commit flips it live.
    * Work is proportional to the DELTA's postings; existing bucket files
    * are never rewritten (df/dl/stats are sums over disjoint doc sets,
    * which is exactly why delta ≡ rebuild holds bit-for-bit).
    */
  def append(spark: SparkSession, newDocs: DataFrame, outDir: String): Long = {
    val (epoch, nDocs, tokTotal) = readMeta(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val next = epoch + 1
    val (n, sdl) = stageAndPromote(spark,
      newDocs.select("doc_id", "text"), outDir, next)
    writeMeta(spark, outDir, next, nDocs + n, tokTotal + sdl)
    fsOf(spark, outDir).delete(
      new org.apache.hadoop.fs.Path(s"$outDir/_index/staging/e$next"), true)
    n
  }

  /** Tokenize `docs`, stage their postings, promote into the bucket dirs
    * under `e<next>-*` names, and land the epoch's dl rows — everything a
    * fresh epoch writes EXCEPT the meta commit, which stays with the
    * caller so [[append]] and [[applyDelta]] share one promote path.
    * Returns (docs landed, Σdl landed). Idempotent on retry: the caller's
    * [[clearUncommitted]] removed any crashed attempt's `e<next>` files.
    */
  private def stageAndPromote(spark: SparkSession, docs: DataFrame,
      outDir: String, next: Int): (Long, Long) = {
    val (tf, dl) = project(docs, next)
    val fs = fsOf(spark, outDir)
    val staging = s"$outDir/_index/staging/e$next"
    tf.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    fs.listStatus(stagingPath).map(_.getPath)
      .filter(_.getName.startsWith("bucket=")).foreach { bdir =>
        val target = new org.apache.hadoop.fs.Path(outDir, bdir.getName)
        if (!fs.exists(target)) fs.mkdirs(target)
        fs.listStatus(bdir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .zipWithIndex.foreach { case (f, i) =>
            val dest = new org.apache.hadoop.fs.Path(target, s"e$next-$i.parquet")
            require(fs.rename(f, dest), s"could not promote $f to $dest")
          }
      }
    dl.write.mode("overwrite").parquet(s"${dlDir(outDir)}/e$next")
    val s = dl.agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("t")).head
    (s.getLong(0), s.getLong(1))
  }

  /** One epoch of CDC against the index — the SINGLE-COMMIT form of
    * update = delete + append: `deleteIds` plus the superseded copies of
    * `upserts` are tombstoned, the fresh texts land as postings/dl of the
    * SAME epoch, the meta stats net out victims and add the new docs, and
    * ONE meta commit flips all of it live together. This closes the read
    * anomaly of the two-commit application (delete at N+1, append at N+2:
    * a concurrent [[bm25TopK]] between the commits saw an updated
    * document as absent, and a crash between them left it absent until
    * the epoch replayed) — the [[IndexedLayout.applyDelta]] /
    * [[MatView.refresh]] atomicity, now on the lexical store.
    *
    * Liveness does the sequencing: the tombstones carry as_of = the new
    * epoch and the fresh postings carry epoch = the same value, so the
    * old copy dies exactly when the new one becomes visible (`epoch >=
    * as_of` keeps the fresh rows). Unknown or already-dead delete ids are
    * harmless no-op records; tombstones are written only for LIVE victims
    * so tombstone growth stays proportional to churn. Crash-safe by the
    * usual discipline: every pre-commit artifact (tombstone dir, promoted
    * postings, dl dir) is invisible until the commit and rolls back via
    * [[clearUncommitted]] on the next verb. Returns (docs upserted, live
    * docs tombstoned).
    */
  def applyDelta(spark: SparkSession, upserts: DataFrame,
      deleteIds: DataFrame, outDir: String): (Long, Long) = {
    val (epoch, nDocs, tokTotal) = readMeta(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val next = epoch + 1
    // job economy matters here: this sits on the sync loop's per-micro-
    // batch hot path (callers pass a pinned frame — LexIndexSync's
    // checkpointed last-state-wins), so the delta is NOT re-materialized
    // and the touched-id union is NOT deduped (a left_semi probe side
    // tolerates duplicates) — each avoided job is latency every epoch
    val up = upserts.select("doc_id", "text")
    val hasUp = !up.isEmpty
    val touched = deleteIds.select("doc_id").union(up.select("doc_id"))
    // victims = LIVE indexed docs among the touched ids (already-dead and
    // unknown ids must not re-subtract from the stats)
    val victims = readDl(spark, outDir, epoch,
        readDeleted(spark, outDir, epoch))
      .join(touched, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val vs = victims.agg(count(lit(1)).as("n"),
      coalesce(sum("dl"), lit(0L)).as("t")).head
    val (k, sdl) = (vs.getLong(0), vs.getLong(1))
    if (!hasUp && k == 0) return (0L, 0L)
    if (k > 0)
      victims.select(col("doc_id"), lit(next).as("as_of"))
        .write.mode("overwrite").parquet(s"${delDir(outDir)}/e$next")
    if (hasUp) {
      val (n, t) = stageAndPromote(spark, up, outDir, next)
      writeMeta(spark, outDir, next, nDocs - k + n, tokTotal - sdl + t)
      fsOf(spark, outDir).delete(
        new org.apache.hadoop.fs.Path(s"$outDir/_index/staging/e$next"), true)
      (n, k)
    } else {
      writeMeta(spark, outDir, next, nDocs - k, tokTotal - sdl)
      (0L, k)
    }
  }

  /** The (doc_id, as_of) tombstone frame of committed deletes, max as_of
    * per id — same liveness contract as [[IndexedLayout]]: a tombstone
    * kills rows written BEFORE its epoch, so a re-added document's fresh
    * postings survive the old delete (update = delete + append).
    */
  private def readDeleted(spark: SparkSession, outDir: String,
      epoch: Int): Option[DataFrame] = {
    val fs = fsOf(spark, outDir)
    val dirs = (1 to epoch).map(i => s"${delDir(outDir)}/e$i")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*)
      .groupBy("doc_id").agg(max("as_of").as("as_of")))
  }

  /** Tombstone-resolved liveness join (churn-sized right side). */
  private def liveRows(rows: DataFrame, deleted: Option[DataFrame]): DataFrame =
    deleted match {
      case None => rows
      case Some(t) =>
        rows.join(t, Seq("doc_id"), "left")
          .filter(col("as_of").isNull || col("epoch") >= col("as_of"))
          .drop("as_of")
    }

  /** The PRUNED postings scan: the static bucket list reaches the scan
    * as a partition filter (planning-time dir pruning — the spec asserts
    * numFiles equals the probed buckets' files), uncommitted epochs are
    * filtered out, tombstoned documents' rows resolve away (which keeps
    * the in-bucket df derivation exact over the LIVE set), and only the
    * query tokens' rows survive. bm25TopK materializes this once;
    * exposed separately so the pruning proof can observe the scan's own
    * metrics (the checkpoint hides them from the serving plan).
    */
  private[queries] def readPostings(spark: SparkSession, outDir: String,
      epoch: Int, bucketSet: Seq[Int], qTokens: DataFrame,
      deleted: Option[DataFrame]): DataFrame =
    liveRows(
      spark.read.parquet(outDir)
        .filter(col("bucket").isin(bucketSet.map(b => b: Any): _*))
        .filter(col("epoch") <= epoch) // uncommitted leftovers invisible
        .join(broadcast(qTokens), Seq("token"), "left_semi"),
      deleted)

  /** All committed LIVE dl rows (doc_id, dl). The max-epoch pick per doc
    * makes the read safe against [[compact]]'s post-commit crash window
    * (the consolidated dl copy and a not-yet-dropped original coexist
    * briefly — the newest wins; one row per doc either way).
    */
  private def readDl(spark: SparkSession, outDir: String, epoch: Int,
      deleted: Option[DataFrame]): DataFrame = {
    val fs = fsOf(spark, outDir)
    val dirs = (0 to epoch).map(i => s"${dlDir(outDir)}/e$i")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    liveRows(spark.read.parquet(dirs: _*), deleted)
      .groupBy("doc_id").agg(max_by(col("dl"), col("epoch")).as("dl"))
      .select("doc_id", "dl")
  }

  /** CHANGE-DATA-FEED between two committed epochs — the lexical twin of
    * [[IndexedLayout.changesBetween]], derived from the dl store's epoch
    * history (one row per live doc, stamped with its indexing epoch):
    * `upsert` rows are doc_ids LIVE at `to` whose current indexing landed
    * after `from` (new docs and re-indexed updates — net semantics:
    * within-window churn coalesces, added-then-deleted nets out), with
    * the new document length as the change payload (the index stores
    * postings, not text — content itself is upstream's to fetch);
    * `delete` rows are doc_ids live at `from` and gone at `to`. Each side
    * is one dl-snapshot read (doc-count-sized, never postings-sized).
    *
    * `from` must be at or above [[historyFloor]]: compaction re-stamps
    * dl rows to its own epoch, so a diff across that boundary would emit
    * every document as a fake upsert — refused loudly, exactly like the
    * cell layout's rule.
    */
  def changesBetween(spark: SparkSession, outDir: String,
      from: Int, to: Int): DataFrame = {
    val (committed, _, _) = readMeta(spark, outDir)
    val floor = historyFloor(spark, outDir)
    require(from <= to, s"changesBetween: from=$from > to=$to")
    require(to <= committed,
      s"changesBetween: to=$to exceeds committed epoch $committed")
    require(from >= floor,
      s"changesBetween: from=$from predates the history floor $floor — " +
        "compaction dropped the versions this diff would need")
    def snap(e: Int): DataFrame = {
      val fs = fsOf(spark, outDir)
      val dirs = (0 to e).map(i => s"${dlDir(outDir)}/e$i")
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
      if (dirs.isEmpty)
        spark.range(0).select(col("id").as("doc_id"),
          col("id").as("dl"), lit(0).as("epoch"))
      else liveRows(spark.read.parquet(dirs: _*),
          readDeleted(spark, outDir, e))
        .groupBy("doc_id")
        .agg(max_by(struct(col("dl"), col("epoch")), col("epoch")).as("m"))
        .select(col("doc_id"), col("m.dl").as("dl"), col("m.epoch").as("epoch"))
    }
    val before = snap(from)
    val after = snap(to)
    val upserts = after.filter(col("epoch") > from)
      .select(lit("upsert").as("change"), col("doc_id"), col("dl"))
    val deletes = before.select("doc_id")
      .join(after.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(lit("delete").as("change"), col("doc_id"))
    upserts.unionByName(deletes, allowMissingColumns = true)
  }

  /** Compact the index: rewrite buckets holding tombstone-killed postings
    * down to their live rows, consolidate the document-length store, and
    * drop satisfied tombstones — [[IndexedLayout.compact]]'s LSM verb on
    * the lexical layout, with two hard-won refinements over the cell
    * layout's original design:
    *
    *   - TWO-PHASE: the meta commit happens BEFORE any original file is
    *     dropped. Pre-commit, the rewritten copies (named `e<next>c-*`,
    *     epoch column = next) are invisible to readers (the committed-
    *     epoch filter) and every original is intact, so a crash there
    *     loses nothing and [[clearUncommitted]] rolls the copies back;
    *     post-commit, a crash can only leave superseded originals beside
    *     their committed copies — readers briefly see duplicates (the
    *     torn caveat) and the next compact converges them.
    *   - The dirty set bypasses `minDeadFrac` for any bucket showing
    *     torn-state evidence: duplicate (doc_id, token) postings — the
    *     post-commit crash's signature, whose dilution would otherwise
    *     let the policy skip the damaged bucket forever (the exact
    *     failure mode the cell layout's minDeadFrac review found).
    *
    * Unlike a vector (one cell), a document's postings span every bucket
    * its tokens hash to, so tombstones still needed by un-compacted
    * buckets consolidate into the compaction epoch's own deleted dir
    * (original as_of preserved). The dl store rewrites to its live set in
    * the same pass — the price of dropping tombstones that also guard dl
    * rows — and [[readDl]]'s max-epoch pick bridges the window between
    * the meta commit and the old dl dirs' removal. `minDeadFrac` is the
    * usual space-amp knob: only buckets whose dead-posting fraction
    * reaches it rewrite. Single-writer, like every index mutation.
    * Returns (buckets compacted, live postings rewritten).
    */
  def compact(spark: SparkSession, outDir: String,
      minDeadFrac: Double = 0.0): (Int, Long) = {
    val (epoch, nDocs, tokTotal) = readMeta(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val fs = fsOf(spark, outDir)
    val next = epoch + 1
    def dropOldDirs(root: String, lo: Int): Unit =
      dropEpochDirs(spark, root, lo, epoch)
    val tombsOpt = readDeleted(spark, outDir, epoch)
    val raw = spark.read.parquet(outDir).filter(col("epoch") <= epoch)
    val deadRows = tombsOpt match {
      case None => raw.limit(0).withColumn("t_as_of", lit(0))
      case Some(t) => raw.join(t.withColumnRenamed("as_of", "t_as_of"),
        Seq("doc_id")).filter(col("epoch") < col("t_as_of"))
    }
    // per-bucket (dead, total, duplicate-evidence) stats — the bounded
    // driver view the policy decides on (≤ Buckets rows). Torn evidence
    // is duplicate (doc_id, token) pairs among the LIVE rows only: an
    // ordinary update (delete-then-append of the same doc) leaves its
    // OLD posting dead-but-on-disk beside the new one, which is exactly
    // the dead mass minDeadFrac exists to meter — counting raw rows here
    // would flag every update-churned bucket torn and turn the policy
    // knob into dead code; only live duplicates (the post-commit-crash
    // signature) may bypass it.
    val liveDups = liveRows(raw, tombsOpt)
      .groupBy("bucket")
      .agg((count(lit(1)) >
        countDistinct(col("doc_id"), col("token"))).as("torn"))
    val stats = raw.groupBy("bucket")
      .agg(count(lit(1)).as("total"))
      .join(deadRows.groupBy("bucket").agg(count(lit(1)).as("dead")),
        Seq("bucket"), "left")
      .join(liveDups, Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("dead"), lit(0L)).cast("double") / col("total")).as("frac"),
        coalesce(col("torn"), lit(false)).as("torn"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(2)))
    val torn = stats.filter(_._3).map(_._1).toSet
    val dirtyStats = stats.filter(s => s._2 > 0.0 || torn(s._1))
    if (dirtyStats.isEmpty) {
      if (tombsOpt.isEmpty) return (0, 0L)
      // no dead postings on disk: every tombstone is satisfied on the
      // postings side but may still guard dead dl rows — consolidate dl
      // live, commit, and only then drop the tombstones
      readDl(spark, outDir, epoch, tombsOpt).withColumn("epoch", lit(next))
        .write.mode("overwrite").parquet(s"${dlDir(outDir)}/e$next")
      EpochStore.raiseFloor(spark, floorDir(outDir), next) // before the commit: crashes over-clamp only
      writeMeta(spark, outDir, next, nDocs, tokTotal)
      dropOldDirs(delDir(outDir), 1)
      dropOldDirs(dlDir(outDir), 0)
      return (0, 0L)
    }
    val dirty = dirtyStats
      .filter(s => s._2 >= minDeadFrac || torn(s._1)).map(_._1).sorted
    if (dirty.isEmpty) return (0, 0L)
    val survivorTombs =
      if (tombsOpt.isEmpty || dirty.length == dirtyStats.length) None
      else Some(deadRows
        .filter(!col("bucket").isin(dirty.map(b => b: Any): _*))
        .select(col("doc_id"), col("t_as_of").as("as_of"))
        .distinct().localCheckpoint())
    // the live rows of the dirty buckets, one copy per (doc_id, token)
    // (max epoch wins — converges post-commit-crash duplicates)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "token").orderBy(col("epoch").desc)
    val input = liveRows(
        raw.filter(col("bucket").isin(dirty.map(b => b: Any): _*)), tombsOpt)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("epoch", lit(next))
      .localCheckpoint()
    val rewritten = input.count()
    val staging = s"$outDir/_index/staging/compact_e$next"
    input.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val staged = fs.listStatus(stagingPath).map(_.getPath)
      .filter(_.getName.startsWith("bucket=")).map(p => p.getName -> p).toMap
    // phase 1: promote copies (c-namespace) — originals untouched
    dirty.foreach { bucket =>
      val name = s"bucket=$bucket"
      val target = new org.apache.hadoop.fs.Path(outDir, name)
      staged.get(name).foreach { bdir =>
        fs.listStatus(bdir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          .zipWithIndex.foreach { case (f, i) =>
            val dest = new org.apache.hadoop.fs.Path(target, s"e${next}c-$i.parquet")
            require(fs.rename(f, dest), s"could not promote $f to $dest")
          }
      }
    }
    // consolidated dl (live set re-stamped) + surviving tombstones land in
    // the compaction epoch's own dirs — all invisible until the commit
    readDl(spark, outDir, epoch, tombsOpt).withColumn("epoch", lit(next))
      .write.mode("overwrite").parquet(s"${dlDir(outDir)}/e$next")
    survivorTombs.filter(st => !st.isEmpty).foreach(_.coalesce(1)
      .write.mode("overwrite").parquet(s"${delDir(outDir)}/e$next"))
    EpochStore.raiseFloor(spark, floorDir(outDir), next) // before the commit: crashes over-clamp only
    writeMeta(spark, outDir, next, nDocs, tokTotal) // the commit point
    // phase 2: drop the superseded originals + prior-epoch side dirs
    dirty.foreach { bucket =>
      val target = new org.apache.hadoop.fs.Path(outDir, s"bucket=$bucket")
      fs.listStatus(target).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith(s"e${next}c-"))
        .foreach(f => require(fs.delete(f, false), s"could not drop $f"))
    }
    dropOldDirs(delDir(outDir), 1) // pre-compaction dirs; e(next) survives
    dropOldDirs(dlDir(outDir), 0)
    fs.delete(stagingPath, true)
    (dirty.length, rewritten)
  }

  /** DELETE documents from the index — the CDC verb that completes the
    * lexical side's sync story (update = delete + [[append]] under the
    * liveness contract). Tombstones (doc_id, as_of = the delete's epoch)
    * land in their own epoch dir; postings and dl rows resolve away at
    * READ (the [[IndexedLayout]] discipline — no bucket rewrites, work
    * is O(victims)), and because df derives from the live posting list
    * and the meta stats net out the victims' (count, Σdl), every score
    * input — df, dl, N, avgdl — is exactly the survivors': serve ≡
    * rebuild-over-survivors bit-for-bit, spec-proven. Unknown or
    * already-dead ids are a harmless no-op record. Single-writer like
    * every other index mutation. Returns the number of live docs killed.
    */
  def delete(spark: SparkSession, docIds: DataFrame, outDir: String): Long = {
    val (epoch, nDocs, tokTotal) = readMeta(spark, outDir)
    clearUncommitted(spark, outDir, epoch)
    val next = epoch + 1
    // victims = LIVE indexed docs among the requested ids (already-dead
    // and unknown ids must not re-subtract from the stats)
    val victims = readDl(spark, outDir, epoch,
        readDeleted(spark, outDir, epoch))
      .join(docIds.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val s = victims.agg(count(lit(1)).as("n"),
      coalesce(sum("dl"), lit(0L)).as("t")).head
    val (k, sdl) = (s.getLong(0), s.getLong(1))
    if (k > 0)
      victims.select(col("doc_id"), lit(next).as("as_of"))
        .write.mode("overwrite").parquet(s"${delDir(outDir)}/e$next")
    writeMeta(spark, outDir, next, nDocs - k, tokTotal - sdl)
    k
  }

  /** BM25 top-`k` docs per query over the index, reading ONLY the query
    * tokens' buckets (planning-time partition pruning — the physical
    * payoff, numFiles-asserted in InvertedIndexSpec). `queries` is
    * (q_id, text); the query side is broadcast-contract small, so the
    * bucket list is a bounded driver collect (the probeCells idiom).
    * df for each query token comes from the token's full posting list
    * inside its own bucket — exact global df, no global pass. With
    * `excludeQueryDoc` the query's own doc_id is excluded (the catalog
    * row's corpus-member-as-query form). Scoring is tree-identical to
    * q_rank_bm25, so the result is oracle-exact against the same SQL.
    *
    * `asOf` ≥ 0 is TIME TRAVEL, symmetric with
    * [[IndexedLayout.readCorpus]]: every piece of serving state is
    * already epoch-tagged (postings/dl rows carry their write epoch,
    * tombstone and meta dirs are per-epoch), so a snapshot search is the
    * same three monotone gates at an earlier cut — and the scoring
    * CONSTANTS (N, avgdl) read from that epoch's own retained meta, so
    * the snapshot scores exactly as the index scored then. `asOf` below
    * [[historyFloor]] clamps to it (compaction re-stamps rows and drops
    * satisfied tombstones — the Delta VACUUM contract), never returning
    * a silently incomplete view.
    */
  def bm25TopK(spark: SparkSession, outDir: String, queries: DataFrame,
      k: Int, excludeQueryDoc: Boolean = false, asOf: Int = -1): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val (committed, nDocs0, tokTotal0) = readMeta(spark, outDir)
    val epoch = if (asOf < 0 || asOf >= committed) committed
      else math.min(committed,
        math.max(asOf, historyFloor(spark, outDir)))
    val (nDocs, tokTotal) =
      if (epoch == committed) (nDocs0, tokTotal0)
      else readMetaAt(spark, outDir, epoch)
    val qTok = queries
      .select(col("q_id"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      .localCheckpoint()
    // bounded driver collect (|query tokens| ≤ Buckets values): the
    // static bucket list is what lets Spark prune partition dirs at
    // planning time, exactly like IndexedLayout's probed-cell list
    val bucketSet = qTok.select(bucketOf(col("token")).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (bucketSet.isEmpty)
      // derive the empty result from the INPUTS so q_id keeps the caller's
      // type — a spark.range-built frame pinned it to Long, which would
      // schema-mismatch a downstream union/join only in this rare branch
      return queries.limit(0).select(col("q_id"), lit(0).as("rnk"),
        lit(0L).as("doc_id"), lit(0.0d).as("bm25"))
    // one tombstone resolution per call, pinned and shared by the
    // postings scan AND the dl join (each would otherwise re-list and
    // re-read every per-epoch delete dir)
    val tombs = readDeleted(spark, outDir, epoch).map(_.localCheckpoint())
    val post = readPostings(spark, outDir, epoch, bucketSet.toIndexedSeq,
      qTok.select("token").distinct(), tombs)
      .localCheckpoint() // feeds df AND the candidate join — scan once
    val tokDf = post.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(underStopCap(col("df"), lit(nDocs)))
      .withColumn("idf", idfOf(lit(nDocs), col("df")))
      .select("token", "idf")
    // same IEEE division as the direct query's sum(dl)/count census
    val avgdl = tokTotal.toDouble / nDocs
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("bm25").desc, col("doc_id").asc)
    val cand0 = qTok.join(post.select("token", "doc_id", "tf"), "token")
    val cand = if (excludeQueryDoc) cand0.filter(col("doc_id") =!= col("q_id"))
               else cand0
    cand
      .join(tokDf, "token")
      .join(readDl(spark, outDir, epoch, tombs), "doc_id")
      .withColumn("ts",
        termScore(col("tf"), col("dl"), col("idf"), lit(avgdl)))
      .groupBy("q_id", "doc_id").agg(sum("ts").as("bm25"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc_id"),
        round(col("bm25").cast("double"), 4).as("bm25"))
      .orderBy("q_id", "rnk")
  }

  /** Store-level statistics of an index — the [[IndexedLayout.describe]]
    * twin: bounded aggregations only. `deadPostings` quantifies the
    * reclaimable space [[compact]]'s `minDeadFrac` meters; `nDocs` and
    * `tokTotal` are the committed meta's scoring constants (already
    * netted for deletes), re-exposed here beside the physical counts.
    */
  final case class IndexStats(epoch: Int, floor: Int, nDocs: Long,
      tokTotal: Long, buckets: Long, postingsOnDisk: Long,
      livePostings: Long, deadPostings: Long, tombstonedDocs: Long)

  def describe(spark: SparkSession, outDir: String): IndexStats = {
    val (epoch, nDocs, tokTotal) = readMeta(spark, outDir)
    val raw = spark.read.parquet(outDir).filter(col("epoch") <= epoch)
    val r = raw.agg(count(lit(1)).as("n"),
      countDistinct(col("bucket")).as("b")).head
    val tombs = readDeleted(spark, outDir, epoch)
    val live = liveRows(raw, tombs).count()
    IndexStats(epoch, historyFloor(spark, outDir), nDocs, tokTotal,
      r.getLong(1), r.getLong(0), live, r.getLong(0) - live,
      tombs.map(_.count()).getOrElse(0L))
  }

  /** Plain idf-sum top-`k` over the index — the LEXICAL side of the RRF
    * hybrid (q_hybrid_rrf) served from the pruned posting buckets instead
    * of a corpus scan: same planning-time bucket pruning as [[bm25TopK]],
    * same scoring tree as the direct row (idf = round(ln(N/df), 6) in
    * exact DECIMAL, the df·2 ≤ N stop-word cap), so the rank list — and
    * therefore the fused hybrid — is oracle-exact against the identical
    * SQL. A document's rank counts each distinct matching query token
    * once (the postings hold one row per (doc, token); tf is ignored
    * here, exactly like the direct form's distinct-token join).
    */
  def idfTopK(spark: SparkSession, outDir: String, queries: DataFrame,
      k: Int, excludeQueryDoc: Boolean = false): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val (epoch, nDocs, _) = readMeta(spark, outDir)
    val qTok = queries
      .select(col("q_id"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      .localCheckpoint()
    val bucketSet = qTok.select(bucketOf(col("token")).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    if (bucketSet.isEmpty)
      // same-schema-as-main-path rule (see bm25TopK): rrfFuse full-outer-
      // joins this frame on q_id, so the branch must keep the caller's type
      return queries.limit(0).select(col("q_id"), lit(0).as("rnk"),
        lit(0L).as("doc_id"))
    val tombs = readDeleted(spark, outDir, epoch).map(_.localCheckpoint())
    val post = readPostings(spark, outDir, epoch, bucketSet.toIndexedSeq,
      qTok.select("token").distinct(), tombs)
      .localCheckpoint() // feeds df AND the candidate join — scan once
    val tokIdf = post.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") * 2 <= nDocs) // the hybrid row's stop-word cap
      .withColumn("idf", round(log(lit(nDocs).cast("double") /
        col("df")), 6).cast(DecimalType(18, 6)))
      .select("token", "idf")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("lex").desc, col("doc_id").asc)
    val cand0 = qTok.join(post.select("token", "doc_id"), "token")
    val cand = if (excludeQueryDoc) cand0.filter(col("doc_id") =!= col("q_id"))
               else cand0
    cand
      .join(tokIdf, "token")
      .groupBy("q_id", "doc_id").agg(sum("idf").as("lex"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "doc_id")
      .orderBy("q_id", "rnk")
  }
}
