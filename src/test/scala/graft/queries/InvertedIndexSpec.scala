package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted inverted index: token-bucket-partitioned postings whose
  * BM25 serving path (bm25TopK) is bit-identical to the direct
  * q_rank_bm25 computation, reads ONLY the query tokens' buckets
  * (numFiles-asserted planning-time pruning), absorbs id-disjoint deltas
  * bit-for-bit ≡ a rebuild over the union, and keeps a crashed append's
  * leftovers invisible until its meta commit.
  */
class InvertedIndexSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf001)

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def queries = docs.filter(col("doc_id") < 3)
    .select(col("doc_id").as("q_id"), col("text"))

  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      scans(r.child)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  test("bm25TopK over the index ≡ the direct q_rank_bm25 computation") {
    val d = tmp("invidx_parity")
    InvertedIndex.build(spark, docs, d)
    val indexed = canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true))
    val direct = canon(
      graft.SparkEntry.queries("q_rank_bm25")(spark, sf001))
    assert(indexed == direct,
      s"indexed=${indexed.take(3)} direct=${direct.take(3)}")
  }

  test("the serving scan reads only the query tokens' buckets (planning-time pruning)") {
    val d = tmp("invidx_prune")
    InvertedIndex.build(spark, docs, d)
    // a single rare token hits exactly one bucket
    val oneTok = {
      import spark.implicits._
      Seq((42L, "dup")).toDF("q_id", "text")
    }
    assert(InvertedIndex.bm25TopK(spark, d, oneTok, k = 5).count() > 0,
      "fixture: 'dup' must rank documents")
    // observe the pruned scan itself (bm25TopK checkpoints it, which
    // hides the scan from the serving plan's metrics)
    val queryBucket0 = spark.range(1)
      .select(InvertedIndex.bucketOf(lit("dup")).as("b")).head.getInt(0)
    val res = InvertedIndex.readPostings(spark, d, 0, Seq(queryBucket0), {
      import spark.implicits._
      Seq("dup").toDF("token")
    }, None)
    res.collect()
    val scan = scans(res.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(p =>
        p.toString.contains(d) && !p.toString.contains("_index")))
      .getOrElse(fail("no FileSourceScanExec over the postings"))
    assert(scan.partitionFilters.mkString(",").contains("bucket"),
      scan.partitionFilters.mkString(","))
    def filesUnder(sub: String): Int = {
      val f = new java.io.File(d, sub)
      if (!f.exists()) 0
      else f.listFiles().count(_.getName.endsWith(".parquet"))
    }
    val allBuckets = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    val probedFiles = filesUnder(s"bucket=$queryBucket0")
    val allFiles = allBuckets.map(filesUnder).sum
    assert(probedFiles >= 1 && probedFiles < allFiles,
      s"fixture: $probedFiles of $allFiles")
    assert(scan.metrics("numFiles").value == probedFiles,
      s"numFiles=${scan.metrics("numFiles").value}, bucket has $probedFiles")
  }

  test("append ≡ rebuild: delta-indexed corpus serves bit-for-bit like a one-shot build") {
    val half = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong
    val dDelta = tmp("invidx_delta")
    val dFull = tmp("invidx_full")
    InvertedIndex.build(spark, docs.filter(col("doc_id") <= half), dDelta)
    val added = InvertedIndex.append(spark,
      docs.filter(col("doc_id") > half), dDelta)
    assert(added > 0)
    InvertedIndex.build(spark, docs, dFull)
    // identical meta stats and identical serving results
    assert(InvertedIndex.readMeta(spark, dDelta)._2 ==
      InvertedIndex.readMeta(spark, dFull)._2)
    assert(InvertedIndex.readMeta(spark, dDelta)._3 ==
      InvertedIndex.readMeta(spark, dFull)._3)
    val a = canon(InvertedIndex.bm25TopK(spark, dDelta, queries, k = 10,
      excludeQueryDoc = true))
    val b = canon(InvertedIndex.bm25TopK(spark, dFull, queries, k = 10,
      excludeQueryDoc = true))
    assert(a == b)
    // and existing bucket files were never rewritten: every pre-append
    // file name still present
    // (epoch-prefixed delta files land beside them)
    val e1Files = new java.io.File(dDelta).listFiles()
      .filter(_.getName.startsWith("bucket=")).flatMap(_.listFiles())
      .map(_.getName).filter(_.startsWith("e1-"))
    assert(e1Files.nonEmpty, "the delta must land as epoch-1 files")
  }

  test("delete ≡ rebuild over survivors; update = delete + append; unknown ids no-op") {
    import spark.implicits._
    val d = tmp("invidx_del")
    InvertedIndex.build(spark, docs, d)
    // kill a slice that intersects the candidate space
    val dead = docs.select("doc_id").filter(col("doc_id") % 41 === 7)
      .localCheckpoint()
    val nDead = dead.count()
    assert(nDead > 0)
    assert(InvertedIndex.delete(spark, dead, d) == nDead)
    // serve ≡ a one-shot build over the survivors — df/dl/N/avgdl all
    // netted, so every score input is exactly the survivors'
    val dSurv = tmp("invidx_del_surv")
    InvertedIndex.build(spark,
      docs.join(dead, Seq("doc_id"), "left_anti"), dSurv)
    assert(InvertedIndex.readMeta(spark, d)._2 ==
      InvertedIndex.readMeta(spark, dSurv)._2)
    assert(InvertedIndex.readMeta(spark, d)._3 ==
      InvertedIndex.readMeta(spark, dSurv)._3)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) ==
      canon(InvertedIndex.bm25TopK(spark, dSurv, queries, k = 10,
        excludeQueryDoc = true)))
    // update = delete + append: one dead id re-enters with NEW text; its
    // fresh postings outlive the tombstone
    val reborn = dead.orderBy("doc_id").head.getLong(0)
    InvertedIndex.append(spark,
      Seq((reborn, "dup dup table")).toDF("doc_id", "text"), d)
    val dUpd = tmp("invidx_del_upd")
    InvertedIndex.build(spark,
      docs.select("doc_id", "text").join(dead, Seq("doc_id"), "left_anti")
        .unionByName(Seq((reborn, "dup dup table")).toDF("doc_id", "text")),
      dUpd)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) ==
      canon(InvertedIndex.bm25TopK(spark, dUpd, queries, k = 10,
        excludeQueryDoc = true)))
    assert(InvertedIndex.readMeta(spark, d)._2 ==
      InvertedIndex.readMeta(spark, dUpd)._2)
    assert(InvertedIndex.readMeta(spark, d)._3 ==
      InvertedIndex.readMeta(spark, dUpd)._3)
    // unknown and already-dead ids are harmless no-op records
    val statsBefore = InvertedIndex.readMeta(spark, d)
    assert(InvertedIndex.delete(spark,
      Seq(999999901L).toDF("doc_id"), d) == 0)
    assert(InvertedIndex.delete(spark, dead.filter(
      col("doc_id") =!= reborn), d) == 0) // already tombstoned
    val statsAfter = InvertedIndex.readMeta(spark, d)
    assert(statsAfter._2 == statsBefore._2 && statsAfter._3 == statsBefore._3)
  }

  test("applyDelta: update + delete + add land under ONE meta commit; crash shows the full old state") {
    import spark.implicits._
    val d = tmp("invidx_applydelta")
    InvertedIndex.build(spark, docs.select("doc_id", "text"), d)
    def serve() = canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true))
    // one CDC epoch: update doc 7, add a brand-new doc, delete doc 11
    val ups = Seq((7L, "dup sort sort merge"),
      (900001L, "dup spark merge window")).toDF("doc_id", "text")
    val dels = Seq(11L).toDF("doc_id")
    assert(InvertedIndex.applyDelta(spark, ups, dels, d) == ((2L, 2L)))
    // exactly ONE epoch advanced — the single-commit evidence
    assert(InvertedIndex.readMeta(spark, d)._1 == 1)
    // ≡ a rebuild of the live corpus, serving and stats
    val dRef = tmp("invidx_applydelta_ref")
    InvertedIndex.build(spark,
      docs.select("doc_id", "text").filter(!col("doc_id").isin(7L, 11L))
        .unionByName(ups), dRef)
    assert(serve() == canon(InvertedIndex.bm25TopK(spark, dRef, queries,
      k = 10, excludeQueryDoc = true)))
    assert(InvertedIndex.readMeta(spark, d)._2 ==
      InvertedIndex.readMeta(spark, dRef)._2)
    assert(InvertedIndex.readMeta(spark, d)._3 ==
      InvertedIndex.readMeta(spark, dRef)._3)
    // an all-unknown delta is a no-op: no epoch burned
    assert(InvertedIndex.applyDelta(spark, ups.limit(0),
      Seq(999999902L).toDF("doc_id"), d) == ((0L, 0L)))
    assert(InvertedIndex.readMeta(spark, d)._1 == 1)

    // the anomaly the single commit closes: a second update crashes AT
    // the commit (marker lost) — a reader sees the FULL epoch-1 state,
    // the updated doc still answering with its epoch-1 text, never the
    // absent-document gap of the old delete-then-append application
    val served1 = serve()
    val ups2 = Seq((7L, "dup hash join")).toDF("doc_id", "text")
    assert(InvertedIndex.applyDelta(spark, ups2,
      ups2.limit(0).select("doc_id"), d) == ((1L, 1L)))
    val marker = java.nio.file.Paths.get(d,
      "_index", "meta", "e2", "_graft_committed")
    assert(java.nio.file.Files.deleteIfExists(marker))
    assert(InvertedIndex.readMeta(spark, d)._1 == 1)
    assert(serve() == served1,
      "a crashed delta must leave the old state fully visible")
    // the retry converges to the new state
    assert(InvertedIndex.applyDelta(spark, ups2,
      ups2.limit(0).select("doc_id"), d) == ((1L, 1L)))
    val dRef2 = tmp("invidx_applydelta_ref2")
    InvertedIndex.build(spark,
      docs.select("doc_id", "text").filter(!col("doc_id").isin(7L, 11L))
        .unionByName(Seq((900001L, "dup spark merge window"),
          (7L, "dup hash join")).toDF("doc_id", "text")), dRef2)
    assert(serve() == canon(InvertedIndex.bm25TopK(spark, dRef2, queries,
      k = 10, excludeQueryDoc = true)))
  }

  test("bm25TopK(asOf) reconstructs every epoch's serving state; compact raises the floor") {
    val half = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong
    val d = tmp("invidx_asof")
    def serveAt(asOf: Int): Seq[String] =
      canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
        excludeQueryDoc = true, asOf = asOf))
    InvertedIndex.build(spark, docs.filter(col("doc_id") <= half), d)
    val s0 = serveAt(-1)
    InvertedIndex.append(spark, docs.filter(col("doc_id") > half), d)
    val s1 = serveAt(-1)
    val dead = docs.select("doc_id").filter(col("doc_id") % 53 === 9)
      .localCheckpoint()
    assert(InvertedIndex.delete(spark, dead, d) > 0)
    val s2 = serveAt(-1)
    assert(Seq(s0, s1, s2).distinct.size == 3,
      "fixture: each epoch must change the serving state")
    // every committed epoch reconstructs — including its own scoring
    // constants (N, avgdl from that epoch's retained meta); out-of-range
    // clamps to newest
    assert(serveAt(0) == s0)
    assert(serveAt(1) == s1)
    assert(serveAt(2) == s2)
    assert(serveAt(99) == s2)
    // compaction raises the floor; older snapshots clamp to it
    assert(InvertedIndex.historyFloor(spark, d) == 0)
    assert(InvertedIndex.compact(spark, d)._1 > 0)
    assert(InvertedIndex.historyFloor(spark, d) == 3)
    assert(serveAt(-1) == s2, "compaction must preserve the live serving state")
    assert(serveAt(0) == s2, "below-floor snapshots must clamp to the compacted state")
  }

  test("compact rewrites churned buckets to their live set; clean buckets untouched; repeat no-op") {
    val d = tmp("invidx_compact")
    InvertedIndex.build(spark, docs, d)
    val dead = docs.select("doc_id").filter(col("doc_id") % 83 === 5)
      .localCheckpoint()
    assert(InvertedIndex.delete(spark, dead, d) == dead.count())
    val before = canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true))
    val rawBefore = spark.read.parquet(d).count()
    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(d).listFiles().filter(_.getName.startsWith("bucket="))
        .map(b => b.getName -> b.listFiles()
          .map(_.getName).filter(_.endsWith(".parquet")).toSet).toMap
    val filesBefore = bucketFiles()
    val (buckets, rewritten) = InvertedIndex.compact(spark, d)
    assert(buckets > 0 && rewritten > 0)
    // dead postings physically gone; serving unchanged; tombstones gone
    assert(spark.read.parquet(d).count() < rawBefore)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) == before)
    assert(!new java.io.File(d, "_index/deleted").exists() ||
      new java.io.File(d, "_index/deleted").listFiles().isEmpty)
    // clean buckets untouched file-for-file
    val filesAfter = bucketFiles()
    val changed = filesAfter.filter { case (b, f) => filesBefore(b) != f }
    assert(changed.nonEmpty)
    filesAfter.keys.filterNot(changed.contains).foreach { b =>
      assert(filesAfter(b) == filesBefore(b), s"clean bucket $b touched") }
    // repeat is a no-op; further CDC still lands
    assert(InvertedIndex.compact(spark, d) == ((0, 0L)))
    import spark.implicits._
    InvertedIndex.append(spark,
      Seq((900001L, "dup merge")).toDF("doc_id", "text"), d)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) != before) // 'dup' postings changed df
  }

  test("a torn bucket (post-commit crash duplicates) bypasses minDeadFrac and repairs") {
    import spark.implicits._
    val d = tmp("invidx_torn")
    InvertedIndex.build(spark, docs, d)
    val (epoch, n0, t0) = InvertedIndex.readMeta(spark, d)
    // hand-build the post-commit crash state: a bucket's rows duplicated
    // as committed-epoch compaction copies (e<epoch>c-*), originals still
    // in place — visible duplicates whose dilution would evade a high
    // threshold without the torn rule
    val bdir = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("bucket=")).maxBy(
        _.listFiles().map(_.length()).sum)
    val bucket = bdir.getName.stripPrefix("bucket=").toInt
    val copyRows = spark.read.parquet(d).filter(col("bucket") === bucket)
      .drop("bucket")
    val staging = java.nio.file.Files.createTempDirectory("torn_idx").toString
    copyRows.coalesce(1).write.mode("overwrite").parquet(staging)
    new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
        case (f, i) => java.nio.file.Files.move(f.toPath,
          new java.io.File(bdir, s"e${epoch}c-9$i.parquet").toPath)
      }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    // duplicates are visible (committed epoch) — df doubled for that
    // bucket's tokens until repair
    val dups = spark.read.parquet(d).groupBy("doc_id", "token")
      .count().filter(col("count") > 1).count()
    assert(dups > 0, "fixture: duplicates must exist")
    val (buckets, _) = InvertedIndex.compact(spark, d, minDeadFrac = 0.9)
    assert(buckets == 1, s"the torn bucket must compact, got $buckets")
    assert(spark.read.parquet(d).groupBy("doc_id", "token")
      .count().filter(col("count") > 1).isEmpty)
    val (_, n1, t1) = InvertedIndex.readMeta(spark, d)
    assert(n1 == n0 && t1 == t0)
    // and the repaired index serves exactly like an untouched build
    val dRef = tmp("invidx_torn_ref")
    InvertedIndex.build(spark, docs, dRef)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) ==
      canon(InvertedIndex.bm25TopK(spark, dRef, queries, k = 10,
        excludeQueryDoc = true)))
  }

  test("a crashed delete's tombstones roll back — the next verb's commit cannot resurrect them") {
    import spark.implicits._
    val d = tmp("invidx_crashdel")
    InvertedIndex.build(spark, docs, d)
    val before = canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true))
    val (e0, n0, t0) = InvertedIndex.readMeta(spark, d)
    // real delete, then roll back ONLY its meta commit: the tombstone dir
    // exists at epoch e0+1 but was never committed — the abandoned-crash
    // state
    InvertedIndex.delete(spark,
      docs.select("doc_id").filter(col("doc_id") % 37 === 3), d)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$d/_index/meta/e${e0 + 1}"))
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) == before, "uncommitted tombstones must be invisible")
    // a DIFFERENT verb now commits the same epoch number: the orphaned
    // tombstones must be rolled back, not resurrected — the crashed
    // delete's victims still serve and the stats still count them
    InvertedIndex.append(spark,
      Seq((920001L, "dup resurrect merge")).toDF("doc_id", "text"), d)
    val (e1, n1, _) = InvertedIndex.readMeta(spark, d)
    assert(e1 == e0 + 1 && n1 == n0 + 1)
    val dRef = tmp("invidx_crashdel_ref")
    InvertedIndex.build(spark,
      docs.select("doc_id", "text")
        .unionByName(Seq((920001L, "dup resurrect merge")).toDF("doc_id", "text")),
      dRef)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) ==
      canon(InvertedIndex.bm25TopK(spark, dRef, queries, k = 10,
        excludeQueryDoc = true)),
      "the crashed delete's victims must still serve after the append commits")
  }

  test("ordinary update churn does not trip torn detection past minDeadFrac") {
    import spark.implicits._
    val d = tmp("invidx_churn_policy")
    InvertedIndex.build(spark, docs, d)
    // a handful of in-place updates: old postings go dead-but-on-disk
    // beside the new ones — the dead mass the policy exists to METER,
    // not torn-state evidence
    (1 to 3).foreach { pass =>
      val ids = Seq(101L, 102L, 103L)
      InvertedIndex.delete(spark, ids.toDF("doc_id"), d)
      InvertedIndex.append(spark,
        ids.map(i => (i, s"dup churn$pass merge window")).toDF("doc_id", "text"), d)
    }
    // dead fraction is tiny (9 doc-generations over ~15k postings), no
    // live duplicates exist — a high threshold must leave everything
    // in place
    assert(InvertedIndex.compact(spark, d, minDeadFrac = 0.9) == ((0, 0L)),
      "update churn alone must not bypass the policy threshold")
    // and the full-repair pass still reclaims the dead mass afterwards
    assert(InvertedIndex.compact(spark, d)._1 > 0)
  }

  test("changesBetween: applying the diff to snapshot(a) yields snapshot(b); floor refuses") {
    import spark.implicits._
    val d = tmp("invidx_cdf")
    InvertedIndex.build(spark, docs, d)
    // e1: delete a slice; e2: append fresh docs (incl. one that nets out
    // later); e3: delete the transient + update an existing doc
    InvertedIndex.delete(spark,
      docs.select("doc_id").filter(col("doc_id") % 13 === 2), d)
    InvertedIndex.append(spark,
      Seq((930001L, "dup transient merge"), (930002L, "dup keeper window"))
        .toDF("doc_id", "text"), d)
    InvertedIndex.delete(spark, Seq(930001L, 5L).toDF("doc_id"), d)
    InvertedIndex.append(spark,
      Seq((5L, "dup updated body sort")).toDF("doc_id", "text"), d)
    // epochs: build=0, delete=1, append=2, delete=3, append=4
    def applyDiff(baseIds: Set[Long], a: Int, b: Int): Set[Long] = {
      val diff = InvertedIndex.changesBetween(spark, d, a, b)
        .select("change", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val touched = diff.map(_._2).toSet
      (baseIds -- touched) ++ diff.filter(_._1 == "upsert").map(_._2)
    }
    // ground truth per epoch from the verbs above
    val d0 = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val d1 = d0.filterNot(_ % 13 == 2)
    val d2 = d1 ++ Set(930001L, 930002L)
    val d3 = d2 -- Set(930001L, 5L)
    val d4 = d3 + 5L
    val truth = Vector(d0, d1, d2, d3, d4)
    for (a <- 0 to 4; b <- a to 4)
      assert(applyDiff(truth(a), a, b) == truth(b), s"diff $a→$b diverged")
    // net semantics across 0→4: the transient 930001 must not appear
    val net = InvertedIndex.changesBetween(spark, d, 0, 4)
      .select("change", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!net.exists(_._2 == 930001L), net.toString)
    assert(net(("upsert", 5L)) && net(("upsert", 930002L)))
    // a compact raises the floor: pre-floor diffs refuse loudly
    InvertedIndex.compact(spark, d)
    intercept[IllegalArgumentException] {
      InvertedIndex.changesBetween(spark, d, 0, 5).collect()
    }
    assert(InvertedIndex.changesBetween(spark, d, 5, 5).isEmpty)
  }

  test("a crashed append (promoted files, no meta commit) is invisible; the retry converges") {
    val half = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0).toLong
    val d = tmp("invidx_crash")
    InvertedIndex.build(spark, docs.filter(col("doc_id") <= half), d)
    val before = canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true))
    // simulate the crash window: run a full append, then roll back ONLY
    // the meta commit — promoted e1-* postings and the e1 dl dir remain
    InvertedIndex.append(spark, docs.filter(col("doc_id") > half), d)
    val fs = new java.io.File(s"$d/_index/meta/e1")
    assert(fs.exists())
    org.apache.commons.io.FileUtils.deleteQuietly(fs)
    // readers see the committed epoch 0 only: the orphaned epoch-1
    // postings are filtered out by epoch <= committed
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) == before)
    // the retry clears its own e1-* prefix and converges to the full view
    InvertedIndex.append(spark, docs.filter(col("doc_id") > half), d)
    val dFull = tmp("invidx_crash_full")
    InvertedIndex.build(spark, docs, dFull)
    assert(canon(InvertedIndex.bm25TopK(spark, d, queries, k = 10,
      excludeQueryDoc = true)) ==
      canon(InvertedIndex.bm25TopK(spark, dFull, queries, k = 10,
        excludeQueryDoc = true)))
  }
}
