package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The physical IVF layout's contract, end to end: writing the corpus
  * cell-partitioned buys an ANN search that PRUNES DIRECTORIES at
  * planning time — the executed scan reads exactly the probed cells'
  * files — while returning the row-identical answer of the same IVF
  * search over the unpartitioned frame. This is PartitionPruningSpec's
  * proof shape applied to the vector index layout the VectorIndex /
  * knnGraphIvf scaladocs assert for 100 TB.
  */
class IndexedLayoutSpec extends SparkSpec {

  // 16 cells against 5 two-probe queries: the probe set cannot cover the
  // layout, so the prune assertion has directories left to NOT read
  private val (nc, np, kk) = (16, 2, 5)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    IndexedLayout.write(spark,
      graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding"),
      d, kCells = nc)
    d
  }

  private def queries = graft.Tables.embeddings(spark, sf001)
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def filesUnder(sub: String): Long = {
    val f = new java.io.File(dir, sub)
    if (!f.isDirectory) 0L
    else f.listFiles().count(x => x.isFile && x.getName.endsWith(".parquet")).toLong
  }

  test("write lays the corpus out as one cell=... directory per posting list") {
    val cellDirs = new java.io.File(dir).list().filter(_.startsWith("cell="))
    assert(cellDirs.length > 1 && cellDirs.length <= nc)
    // complete: every vector is in exactly one posting list
    val n = graft.Tables.embeddings(spark, sf001).count()
    assert(spark.read.parquet(dir).count() == n)
    assert(spark.read.parquet(dir).select("vec_id").distinct().count() == n)
  }

  test("the pruned search reads exactly the probed cells' files") {
    val centroids = IndexedLayout.readCentroids(spark, dir)
    val probed = IndexedLayout.probeCells(queries, centroids, np)
      .select("cell").distinct().collect().map(_.getInt(0)).sorted
    val allCells = new java.io.File(dir).list().filter(_.startsWith("cell="))
      .map(_.stripPrefix("cell=").toInt)
    assert(probed.length < allCells.length,
      s"fixture: probes ${probed.toSeq} must not cover all ${allCells.toSeq}")

    val q = IndexedLayout.prunedTopK(spark, dir, queries, kk, np)
    val rows = q.collect()
    assert(rows.nonEmpty)

    // the plan has two parquet scans (query side reads the unpartitioned
    // table) and AQE wraps executed stages — descend through adaptive /
    // query-stage shells to the LAYOUT's scan specifically
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains(dir)))
      .getOrElse(fail("no FileSourceScanExec over the layout dir"))
    // the partition filter is in the executed plan…
    val pf = scan.partitionFilters.mkString(",")
    assert(pf.contains("cell"), s"cell filter not in PartitionFilters: $pf")
    // …and the runtime metric proves the prune: the scan read the probed
    // cells' files and none of the other posting lists'
    val probedFiles = probed.map(c => filesUnder(s"cell=$c")).sum
    val allFiles = allCells.map(c => filesUnder(s"cell=$c")).sum
    assert(probedFiles >= 1 && probedFiles < allFiles,
      s"fixture: $probedFiles of $allFiles")
    assert(scan.metrics("numFiles").value == probedFiles,
      s"numFiles = ${scan.metrics("numFiles").value}, probed cells have $probedFiles")
  }

  test("append lands a delta in its cells; search over the grown layout is exact") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val d = java.nio.file.Files.createTempDirectory("ivf_layout_app").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    IndexedLayout.write(spark, e.filter(col("vec_id") <= mid), d, kCells = nc)
    val appended = IndexedLayout.append(spark, e.filter(col("vec_id") > mid), d)
    assert(appended > 0)
    // complete and duplicate-free after the append
    assert(spark.read.parquet(d).count() == e.count())
    assert(spark.read.parquet(d).select("vec_id").distinct().count() == e.count())
    // the grown layout answers exactly like a from-scratch layout under
    // the SAME pinned quantizer (append never retrains)
    val d2 = java.nio.file.Files.createTempDirectory("ivf_layout_full").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d2)))
    IndexedLayout.write(spark, e, d2,
      centroidsOverride = IndexedLayout.readCentroids(spark, d))
    val got = IndexedLayout.prunedTopK(spark, d, queries, kk, np)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val want = IndexedLayout.prunedTopK(spark, d2, queries, kk, np)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(want.nonEmpty && got == want)
    // contract guards: out-of-order ids are loud, empty deltas are no-ops
    assert(intercept[IllegalArgumentException] {
      IndexedLayout.append(spark, e.limit(10), d)
    }.getMessage.contains("append-only"))
    assert(IndexedLayout.append(spark, e.limit(0), d) == 0L)
  }

  test("a crashed append retries to the exact same layout (idempotent names)") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val delta = e.filter(col("vec_id") > mid)
    val d = java.nio.file.Files.createTempDirectory("ivf_layout_crash").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    IndexedLayout.write(spark, e.filter(col("vec_id") <= mid), d, kCells = nc)

    // simulate an append that died AFTER promoting its files but BEFORE
    // the meta commit flipped: run the real append, then delete the epoch-1
    // commit marker — the layout now holds a visible-but-uncommitted delta
    IndexedLayout.append(spark, delta, d)
    val marker = java.nio.file.Paths.get(d, "_index", "meta", "e1", "_graft_committed")
    assert(java.nio.file.Files.deleteIfExists(marker))

    // the crashed attempt may also have staged MORE files than the retry
    // will (committer/config drift): plant a stale e1-* tail — a real
    // parquet copy, so a failed prefix-clear would surface as duplicate
    // rows, not a read error — and prove the retry clears it
    // any cell that took epoch-1 files will be re-staged by the retry
    // (same delta, same deterministic assignment), so its prefix-clear runs
    val anyE1 = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("cell=")).flatMap(_.listFiles())
      .filter(_.getName.startsWith("e1-")).minBy(_.getName)
    val staleTail = new java.io.File(anyE1.getParentFile, "e1-99.parquet")
    java.nio.file.Files.copy(anyE1.toPath, staleTail.toPath)

    // the retry is NOT blocked (the hwm only advances at commit), overwrites
    // the same epoch-1 file names, clears the stale tail, and lands the
    // committed, exact layout
    assert(IndexedLayout.append(spark, delta, d) > 0)
    assert(java.nio.file.Files.exists(marker))
    assert(!staleTail.exists(), "retry left a stale e1-* tail behind")
    assert(spark.read.parquet(d).count() == e.count())
    assert(spark.read.parquet(d).select("vec_id").distinct().count() == e.count())
  }

  test("filtered pruned search: metadata filter composes with planning-time pruning") {
    // the q_sim_topk_filtered semantics on the PHYSICAL path: candidates
    // restrict to the allowed set BEFORE ranking, and the partition prune
    // still happens (filter and prune STACK, neither disables the other)
    val allowed = graft.Tables.documents(spark, sf001)
      .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
      .localCheckpoint()
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    assert(allowedSet.nonEmpty && allowedSet.size < 500)

    // nprobe = all cells ⇒ the search is exact: must equal the filtered
    // brute force over the raw embeddings
    val e = graft.Tables.embeddings(spark, sf001)
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("embedding")))
    val q = broadcast(e.filter(col("vec_id") < 5).select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_n")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    val brute = q.join(e.join(allowed, Seq("vec_id"), "left_semi"),
        col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(graft.functions.VectorFunctions.cosineWithNorms(
        col("q_emb").cast("array<double>"), col("embedding").cast("array<double>"),
        col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kk)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        graft.Canon.r4(col("cos_r")).as("cos"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(IndexedLayout.prunedTopK(spark, dir, queries, kk, nc,
      allowedIds = allowed)) == canon(brute))

    // under a REAL prune (nprobe = np < all cells) every neighbor still
    // satisfies the filter and the layout scan still reads only the
    // probed cells' files
    val pruned = IndexedLayout.prunedTopK(spark, dir, queries, kk, np,
      allowedIds = allowed)
    val rows = pruned.collect()
    assert(rows.nonEmpty && rows.forall(r => allowedSet(r.getLong(2))))
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(pruned.queryExecution.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains(dir)))
      .getOrElse(fail("no FileSourceScanExec over the layout dir"))
    assert(scan.partitionFilters.mkString(",").contains("cell"))
    val centroids = IndexedLayout.readCentroids(spark, dir)
    val probedFiles = IndexedLayout.probeCells(queries, centroids, np)
      .select("cell").distinct().collect().map(_.getInt(0))
      .map(c => filesUnder(s"cell=$c")).sum
    assert(scan.metrics("numFiles").value == probedFiles)
  }

  test("pruned layout search ≡ the same IVF search over the unpartitioned frame") {
    val centroids = IndexedLayout.readCentroids(spark, dir)
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val sigs = VectorQueries.nrmFrame(e)
    val membership = VectorQueries.ivfAssign(sigs, centroids, nprobe = 1)
    val probes = IndexedLayout.probeCells(queries, centroids, np)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    val oracle = broadcast(queries
        .select(col("q_id"), col("q_emb"),
          graft.functions.VectorFunctions.l2Norm(col("q_emb")).as("q_n"))
        .join(probes, "q_id"))
      .join(sigs.join(membership, "vec_id"), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos_r", round(graft.functions.VectorFunctions.cosineWithNorms(
        col("q_emb").cast("array<double>"), col("embedding").cast("array<double>"),
        col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kk)
      .select(col("q_id"), col("rnk"), col("vec_id"),
        graft.Canon.r4(col("cos_r")).as("cos"))
    val got = IndexedLayout.prunedTopK(spark, dir, queries, kk, np)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val want = oracle.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(want.nonEmpty && got == want)
  }
}
