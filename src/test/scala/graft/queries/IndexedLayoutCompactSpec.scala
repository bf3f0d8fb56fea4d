package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction closes the layout's LSM lifecycle: churned cells collapse to
  * their live set, satisfied tombstones disappear, clean cells' files are
  * untouched byte-for-byte — and the LIVE VIEW (readCorpus, prunedTopK)
  * is identical before and after. Re-running is a no-op.
  */
class IndexedLayoutCompactSpec extends SparkSpec {

  private val (nc, np, kk) = (16, 2, 5)

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def queries = graft.Tables.embeddings(spark, sf001)
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def cellFiles(d: String): Map[String, Set[String]] =
    new java.io.File(d).listFiles().filter(_.getName.startsWith("cell="))
      .map(c => c.getName -> c.listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet).toMap

  test("compact rewrites only churned cells, preserves the live view, drops tombstones") {
    val d = tmp("ivf_compact")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    val deadIds = emb.select("vec_id").filter(col("vec_id") % 89 === 7)
    val updated = emb.join(deadIds, Seq("vec_id"), "left_semi")
      .filter(col("vec_id") % 2 === 1)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(-x as float))"))
      .localCheckpoint()
    // churn: delete some ids, upsert new versions of others
    IndexedLayout.delete(spark,
      deadIds.join(updated, Seq("vec_id"), "left_anti"), d)
    IndexedLayout.upsert(spark, updated, d)

    val filesBefore = cellFiles(d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))
    val searchBefore = canon(IndexedLayout.prunedTopK(spark, d, queries, kk, np))
    val rawBefore = spark.read.parquet(d).count()
    assert(rawBefore > liveBefore.size, "fixture: dead rows must exist on disk")

    val (cells, rewritten) = IndexedLayout.compact(spark, d)
    assert(cells > 0 && rewritten > 0)

    // live view identical; dead rows physically gone; tombstones dropped
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    assert(spark.read.parquet(d).count() == liveBefore.size)
    assert(canon(IndexedLayout.prunedTopK(spark, d, queries, kk, np))
      == searchBefore)
    assert(!new java.io.File(d, "_index/tombstones").exists() ||
      new java.io.File(d, "_index/tombstones").listFiles().isEmpty)

    // clean cells untouched file-for-file; churned cells hold only the
    // compaction epoch's files
    val filesAfter = cellFiles(d)
    val changed = filesAfter.filter { case (c, fsNow) => filesBefore(c) != fsNow }
    assert(changed.nonEmpty && changed.size < filesAfter.size)
    val epochPrefix = changed.values.flatten.map(_.takeWhile(_ != '-')).toSet
    assert(epochPrefix.size == 1, s"mixed epochs in compacted cells: $epochPrefix")
    filesAfter.keys.filterNot(changed.contains).foreach { c =>
      assert(filesAfter(c) == filesBefore(c), s"clean cell $c was touched")
    }

    // re-running is a no-op (no dead rows left)
    assert(IndexedLayout.compact(spark, d) == ((0, 0L)))
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)

    // and the compacted layout still takes further CDC epochs
    val more = emb.limit(3)
      .withColumn("vec_id", col("vec_id") + 700000L).localCheckpoint()
    IndexedLayout.append(spark, more, d)
    assert(IndexedLayout.readCorpus(spark, d).count() == liveBefore.size + 3)
  }

  test("minDeadFrac compacts only cells past the threshold; surviving tombstones keep killing") {
    val d = tmp("ivf_compact_policy")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    // pick the two fullest cells: A gets heavy churn (all but one id dead),
    // B light churn (exactly one id dead) — A's dead fraction clears 0.5,
    // B's stays below it (>= 3 rows in each by construction)
    val byCount = spark.read.parquet(d).groupBy("cell").count()
      .orderBy(col("count").desc, col("cell")).collect()
    assert(byCount(1).getLong(1) >= 3, "fixture: need two cells with >= 3 rows")
    val (cellA, cellB) = (byCount(0).getInt(0), byCount(1).getInt(0))
    def idsOf(c: Int) = spark.read.parquet(d).filter(col("cell") === c)
      .select("vec_id").orderBy("vec_id")
    IndexedLayout.delete(spark, idsOf(cellA).limit(
      idsOf(cellA).count().toInt - 1), d)
    IndexedLayout.delete(spark, idsOf(cellB).limit(1), d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))
    val filesBefore = cellFiles(d)

    val (cells, _) = IndexedLayout.compact(spark, d, minDeadFrac = 0.5)
    assert(cells == 1, s"only the heavy cell should compact, got $cells")
    // live view unchanged — B's tombstone survived consolidation and still
    // kills its row
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    // A rewritten, B untouched file-for-file
    val filesAfter = cellFiles(d)
    assert(filesAfter(s"cell=$cellA") != filesBefore(s"cell=$cellA"))
    assert(filesAfter(s"cell=$cellB") == filesBefore(s"cell=$cellB"))
    // A's dead rows physically gone; B's still on disk awaiting threshold
    assert(spark.read.parquet(d).filter(col("cell") === cellA).count() == 1)
    assert(spark.read.parquet(d).filter(col("cell") === cellB).count()
      == filesBeforeRowCount(d, cellB, byCount))
    // exactly one consolidated tombstone dir remains, holding only B's id
    val tombFiles = new java.io.File(d, "_index/tombstones").listFiles()
    assert(tombFiles.length == 1, tombFiles.map(_.getName).mkString(","))
    val survivors = spark.read.parquet(tombFiles.head.getPath)
    assert(survivors.count() == 1)
    // below-threshold everywhere: a repeat at the same threshold is a no-op
    assert(IndexedLayout.compact(spark, d, minDeadFrac = 0.5) == ((0, 0L)))
    // full repair clears the rest
    val (cells2, _) = IndexedLayout.compact(spark, d)
    assert(cells2 == 1)
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    assert(!new java.io.File(d, "_index/tombstones").exists() ||
      new java.io.File(d, "_index/tombstones").listFiles().isEmpty)
  }

  /** B's on-disk row count is unchanged by the threshold pass (its dead row
    * stays until its own compaction) — read it from the pre-churn census.
    */
  private def filesBeforeRowCount(d: String, cell: Int,
      byCount: Array[org.apache.spark.sql.Row]): Long =
    byCount.find(_.getInt(0) == cell).get.getLong(1)

  test("leftover pre-compaction tombstone dirs (crash before the drop) are harmless and re-converge") {
    val d = tmp("ivf_compact_crash")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    val byCount = spark.read.parquet(d).groupBy("cell").count()
      .orderBy(col("count").desc, col("cell")).collect()
    val (cellA, cellB) = (byCount(0).getInt(0), byCount(1).getInt(0))
    def idsOf(c: Int) = spark.read.parquet(d).filter(col("cell") === c)
      .select("vec_id").orderBy("vec_id")
    IndexedLayout.delete(spark, idsOf(cellA).limit(
      idsOf(cellA).count().toInt - 1), d)
    IndexedLayout.delete(spark, idsOf(cellB).limit(1), d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))
    // snapshot the pre-compaction tombstone dirs (e1, e2)
    val tombRoot = new java.io.File(d, "_index/tombstones")
    val snap = java.nio.file.Files.createTempDirectory("tomb_snap").toFile
    org.apache.commons.io.FileUtils.copyDirectory(tombRoot, snap)

    assert(IndexedLayout.compact(spark, d, minDeadFrac = 0.5)._1 == 1)
    // crash window: the meta epoch committed and the survivors landed in
    // e3, but the pre-compaction dirs were never dropped — restore them
    snap.listFiles().foreach(src => org.apache.commons.io.FileUtils
      .copyDirectory(src, new java.io.File(tombRoot, src.getName)))

    // harmless: max(as_of) per vec_id makes the duplicates a no-op, and
    // every satisfied tombstone kills nothing (compacted rows are newer)
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    // the next full compact converges the leftover state away entirely
    assert(IndexedLayout.compact(spark, d)._1 == 1) // cellB still dirty
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    assert(!tombRoot.exists() || tombRoot.listFiles().isEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(snap)
  }

  /** (fullest cell, its row count) plus a committed delete of its lowest
    * vec_id — the shared fixture of the two crash-window tests below.
    */
  private def churnedCellFixture(d: String): (Int, Long) = {
    IndexedLayout.write(spark, emb, d, kCells = nc)
    val byCount = spark.read.parquet(d).groupBy("cell").count()
      .orderBy(col("count").desc, col("cell")).collect()
    assert(byCount(0).getLong(1) >= 3, "fixture: need a cell with >= 3 rows")
    val cellA = byCount(0).getInt(0)
    val victim = spark.read.parquet(d).filter(col("cell") === cellA)
      .select("vec_id").orderBy("vec_id").limit(1)
    IndexedLayout.delete(spark, victim, d) // commits meta epoch 1
    (cellA, byCount(0).getLong(1))
  }

  /** Stage cell A's live rows re-stamped to `epoch` as e<epoch>c-* files
    * next to the originals — the on-disk half of a compact pass's phase 1.
    */
  private def plantCopies(d: String, cellA: Int, epoch: Int): Unit = {
    val promoted = IndexedLayout.readCorpus(spark, d)
      .filter(col("cell") === cellA).withColumn("epoch", lit(epoch))
    val staging = java.nio.file.Files.createTempDirectory("torn_stage").toString
    promoted.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging)
    new java.io.File(staging, s"cell=$cellA").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.move(f.toPath, new java.io.File(
          new java.io.File(d, s"cell=$cellA"), s"e${epoch}c-$i.parquet").toPath)
      }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
  }

  test("a compact crash BEFORE its meta commit is invisible and rolls back; originals intact") {
    val d = tmp("ivf_compact_precommit")
    val (cellA, _) = churnedCellFixture(d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))

    // hand-build the phase-1 crash state of a compact that died before
    // its meta commit: copies promoted at the uncommitted epoch 2,
    // tombstones and meta untouched
    plantCopies(d, cellA, epoch = 2)

    // the copies are INVISIBLE (epoch 2 > committed 1): no duplicate
    // reads during the crash window — the committed-epoch gate at work
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    assert(IndexedLayout.readCorpus(spark, d).groupBy("vec_id")
      .count().filter(col("count") > 1).isEmpty)

    // the next verb rolls the orphaned copies back; below-threshold churn
    // stays un-compacted (the crash planted no torn LIVE state)
    assert(IndexedLayout.compact(spark, d, minDeadFrac = 0.9) == ((0, 0L)))
    val leftovers = new java.io.File(d, s"cell=$cellA").listFiles()
      .filter(_.getName.startsWith("e2c-"))
    assert(leftovers.isEmpty, s"orphaned copies not rolled back: ${
      leftovers.map(_.getName).mkString(",")}")
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    // the abandoned pass's work re-runs to convergence on the full repair
    assert(IndexedLayout.compact(spark, d)._1 == 1)
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
  }

  test("a compact crash AFTER its meta commit (live duplicates) bypasses minDeadFrac and re-converges") {
    import spark.implicits._
    val d = tmp("ivf_compact_postcommit")
    val (cellA, nA) = churnedCellFixture(d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))

    // hand-build the phase-2 crash state: copies promoted at epoch 2,
    // history floor raised, META COMMITTED at epoch 2 — but the crash hit
    // before the superseded originals and the satisfied tombstone dir
    // were dropped
    plantCopies(d, cellA, epoch = 2)
    val hwm = spark.read.parquet(s"$d/_index/meta/e1")
      .head.getAs[Long]("max_vec_id")
    Seq((2, hwm)).toDF("epoch", "max_vec_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/_index/meta/e2")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(d, "_index", "meta", "e2", "_graft_committed"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(d, "_index", "floor"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(d, "_index", "floor", "e2"))

    // the documented post-commit torn caveat: cell A's live rows appear
    // twice (original at epoch 0 + committed copy at epoch 2)
    assert(IndexedLayout.readCorpus(spark, d).groupBy("vec_id")
      .count().filter(col("count") > 1).count() > 0,
      "fixture: the post-commit crash must show duplicate live rows")

    // every duplicate's epoch is <= the committed epoch and the one dead
    // row is diluted to 1/(2n-1) < 0.3 — the IndexSync.start default
    // policy threshold alone would skip the damaged cell FOREVER; the
    // live-duplicate torn evidence must force it into the dirty set
    val frac = 1.0 / (2 * nA - 1)
    assert(frac < 0.3, s"fixture: diluted dead fraction $frac must sit below the policy knob")
    val (cells, _) = IndexedLayout.compact(spark, d, minDeadFrac = 0.3)
    assert(cells == 1, s"the torn cell must compact past the threshold, got $cells")
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    assert(IndexedLayout.readCorpus(spark, d).groupBy("vec_id")
      .count().filter(col("count") > 1).isEmpty, "duplicates must be repaired")
    assert(!new java.io.File(d, "_index/tombstones").exists() ||
      new java.io.File(d, "_index/tombstones").listFiles().isEmpty)
    // the repair is stable: a repeat at the same threshold is a no-op
    assert(IndexedLayout.compact(spark, d, minDeadFrac = 0.3) == ((0, 0L)))
  }

  test("a crashed delta's uncommitted tombstones are rolled back, never committed by compact or the next delta") {
    import spark.implicits._
    val d = tmp("ivf_compact_orphan")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    // make the layout compact-eligible (some real dead rows at epoch 1)
    IndexedLayout.delete(spark, emb.select("vec_id")
      .filter(col("vec_id") % 101 === 3), d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))
    // simulate a crashed delete-only delta: its tombstone dir exists at
    // epoch 2 but the meta commit never happened
    val orphanIds = emb.select("vec_id").filter(col("vec_id") % 103 === 5)
      .localCheckpoint()
    assert(orphanIds.count() > 0)
    orphanIds.withColumn("as_of", lit(2)).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/_index/tombstones/e2")
    // uncommitted → invisible
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    // compact commits epoch 2 — the orphans must be rolled back first,
    // or the crashed delete's victims would silently vanish
    assert(IndexedLayout.compact(spark, d)._1 > 0)
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore,
      "compact must not resurrect a crashed delta's tombstones")
    // same hazard through the delete-free delta path: plant another
    // orphan at the next epoch, then append fresh ids (nTomb == 0)
    orphanIds.withColumn("as_of", lit(3)).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/_index/tombstones/e3")
    IndexedLayout.append(spark,
      emb.limit(2).withColumn("vec_id", col("vec_id") + 930000L)
        .localCheckpoint(), d)
    assert(IndexedLayout.readCorpus(spark, d).count() == liveBefore.size + 2,
      "an append must clear, not commit, the orphaned tombstone dir")
  }

  test("a delete-everything cell compacts to empty; unknown-id tombstones clear without work") {
    import spark.implicits._
    val d = tmp("ivf_compact_dead")
    IndexedLayout.write(spark, emb, d, kCells = nc)
    // kill one whole cell
    val cellPick = spark.read.parquet(d).select("cell").head.getInt(0)
    val victims = spark.read.parquet(d)
      .filter(col("cell") === cellPick).select("vec_id").localCheckpoint()
    val nVictims = victims.count()
    IndexedLayout.delete(spark, victims, d)
    val liveBefore = canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding"))
    val (cells, _) = IndexedLayout.compact(spark, d)
    assert(cells >= 1)
    assert(spark.read.parquet(d).count() == emb.count() - nVictims)
    assert(canon(IndexedLayout.readCorpus(spark, d)
      .select("vec_id", "embedding")) == liveBefore)
    // tombstones that never matched a row clear on the fast path
    IndexedLayout.delete(spark, Seq(777777701L).toDF("vec_id"), d)
    assert(IndexedLayout.compact(spark, d) == ((0, 0L)))
    assert(!new java.io.File(d, "_index/tombstones").exists() ||
      new java.io.File(d, "_index/tombstones").listFiles().isEmpty)
  }
}
