package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: the Morton key is bit-exact vs a reference
  * interleave, the layout never changes query answers, and — the point —
  * a 2-D box predicate skips most row groups on the z-ordered copy while
  * a linear-sorted copy can only prune its own sort column.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private def li = graft.Tables.lineitem(spark, sf001)
    .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_quantity")

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      scans(r.child)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  /** Rows the scan SURFACED for `pred` over `dir` — post row-group
    * skipping, pre Spark-side re-filter: the bytes-touched proxy.
    */
  private def scannedRows(dir: String,
      pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(dir).filter(pred)
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  test("zvalue matches a reference bit-interleave and is monotone per octant") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrderLayout.zvalue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y, 4), s"($x,$y)")
    }
    // the curve is a bijection on the grid
    assert(got.values.toSet.size == pts.size)
  }

  test("the z-ordered copy answers exactly like the original table") {
    val d = tmp("zorder_exact")
    ZOrderLayout.write(spark, li, d, "l_extendedprice", "l_orderkey")
    val pred = col("l_extendedprice").between(10000, 20000) &&
      col("l_orderkey") <= 300
    assert(spark.read.parquet(d).count() == li.count())
    assert(canon(spark.read.parquet(d).filter(pred)) ==
      canon(li.filter(pred)))
  }

  test("z-order prunes BOTH dimensions; linear layout is blind to its non-sort column") {
    val zd = tmp("zorder_z")
    val ld = tmp("zorder_linear")
    // 64 files ≈ 94-row groups at sf0.001: fine-grained prunable units
    ZOrderLayout.write(spark, li, zd, "l_extendedprice", "l_orderkey",
      numFiles = 64)
    ZOrderLayout.writeLinear(spark, li, ld, "l_extendedprice", numFiles = 64)
    val total = li.count()
    // the headline claim: a predicate on the NON-sort dimension. The
    // linear layout's orderkey stats are useless (every row group spans
    // ~the whole key range → surfaces everything); z-order bounds every
    // row group inside an orderkey strip → most groups skip.
    val yOnly = col("l_orderkey") <= 150 // ~10% of the 0..1499 domain
    val zY = scannedRows(zd, yOnly)
    val lY = scannedRows(ld, yOnly)
    assert(lY == total,
      s"linear layout should surface all $total rows for an orderkey-only predicate, got $lY")
    assert(zY * 2 <= total,
      s"z-order surfaced $zY of $total rows for the orderkey-only predicate")
    // z-order keeps (coarser) pruning on X too — the price it pays for
    // covering both dimensions from one copy
    val xOnly = col("l_extendedprice").between(10000, 20000) // ~10% mass
    val zX = scannedRows(zd, xOnly)
    assert(zX < total, s"z-order surfaced $zX of $total for price-only")
    // a 2-D box prunes at least as hard as either dimension alone: a row
    // group survives only if BOTH ranges overlap its min/max rectangle
    val box = xOnly && yOnly
    val zBox = scannedRows(zd, box)
    assert(zBox <= zX && zBox <= zY,
      s"box surfaced $zBox vs x-only $zX / y-only $zY")
    assert(zBox * 3 <= total, s"box surfaced $zBox of $total rows")
  }

  test("append lands a pinned-quantizer delta; answers + pruning survive; recluster re-bounds") {
    val d = tmp("zorder_append")
    val base = li.filter(col("l_orderkey") % 2 === 0)
    val delta = li.filter(col("l_orderkey") % 2 === 1).localCheckpoint()
    ZOrderLayout.write(spark, base, d, "l_extendedprice", "l_orderkey",
      numFiles = 32)
    assert(ZOrderLayout.append(spark, delta, d, numFiles = 8) == delta.count())
    // answers ≡ the full original table, exactly
    val pred = col("l_extendedprice").between(10000, 20000) &&
      col("l_orderkey") <= 300
    assert(spark.read.parquet(d).count() == li.count())
    assert(canon(spark.read.parquet(d).filter(pred)) == canon(li.filter(pred)))
    // the delta landed as its own epoch-named files; the base's untouched
    val names = new java.io.File(d).list().filter(_.endsWith(".parquet"))
    assert(names.count(_.startsWith("d1-")) > 0 &&
      names.count(_.startsWith("part-")) > 0)
    // pruning still works across base + delta: the appended z-layout
    // skips most row groups for a non-sort-column predicate where a
    // linear layout of the same full table surfaces everything
    val ld = tmp("zorder_append_linear")
    ZOrderLayout.writeLinear(spark, li, ld, "l_extendedprice", numFiles = 40)
    val yOnly = col("l_orderkey") <= 150
    assert(scannedRows(ld, yOnly) == li.count())
    assert(scannedRows(d, yOnly) * 2 <= li.count(),
      s"appended layout surfaced ${scannedRows(d, yOnly)} of ${li.count()}")
    // a crashed append (promoted files, lost marker) retries to the same
    // names — no duplicates
    val delta2 = delta.withColumn("l_orderkey", col("l_orderkey") + 100000L)
      .localCheckpoint()
    ZOrderLayout.append(spark, delta2, d)
    val marker = java.nio.file.Paths.get(d,
      "_layout", "meta", "e2", "_graft_committed")
    assert(java.nio.file.Files.deleteIfExists(marker))
    assert(ZOrderLayout.append(spark, delta2, d) == delta2.count())
    assert(spark.read.parquet(d).count() == li.count() + delta2.count())
    // OPTIMIZE: recluster into a fresh table version — identical answers,
    // re-bounded file count
    val rd = tmp("zorder_reclustered")
    ZOrderLayout.recluster(spark, d, rd, numFiles = 16)
    assert(canon(spark.read.parquet(rd).filter(pred)) ==
      canon(spark.read.parquet(d).filter(pred)))
    assert(spark.read.parquet(rd).count() == li.count() + delta2.count())
    assert(new java.io.File(rd).list()
      .count(_.endsWith(".parquet")) <= 16)
  }

  test("an empty base's first non-empty append trains and pins the quantizer") {
    val d = tmp("zorder_empty_base")
    ZOrderLayout.write(spark, li.limit(0), d, "l_extendedprice", "l_orderkey")
    assert(ZOrderLayout.append(spark, li.limit(0), d) == 0L) // still empty: no-op
    assert(ZOrderLayout.append(spark, li, d, numFiles = 16) == li.count())
    val pred = col("l_extendedprice").between(10000, 20000) &&
      col("l_orderkey") <= 300
    assert(canon(spark.read.parquet(d).filter(pred)) == canon(li.filter(pred)))
    // and the now-pinned quantizer takes further deltas
    val more = li.limit(50)
      .withColumn("l_orderkey", col("l_orderkey") + 200000L).localCheckpoint()
    assert(ZOrderLayout.append(spark, more, d) == 50L)
    assert(spark.read.parquet(d).count() == li.count() + 50L)
  }

  test("a crashed append is invisible to the committed-epoch reader; retry makes it visible; recluster rolls it back") {
    val d = tmp("zorder_gate")
    val base = li.filter(col("l_orderkey") % 2 === 0)
    ZOrderLayout.write(spark, base, d, "l_extendedprice", "l_orderkey",
      numFiles = 8)
    val delta = li.filter(col("l_orderkey") % 2 === 1).localCheckpoint()
    // crash the append AFTER file promotion: land the delta, then lose the
    // epoch-1 commit marker — promoted d1-* files exist, commit does not
    ZOrderLayout.append(spark, delta, d, numFiles = 4)
    val marker = java.nio.file.Paths.get(d,
      "_layout", "meta", "e1", "_graft_committed")
    assert(java.nio.file.Files.deleteIfExists(marker))
    // a PLAIN reader sees the torn delta (the manifest-less caveat) …
    assert(spark.read.parquet(d).count() == li.count())
    // … the gated reader does not: base rows only, exactly
    assert(ZOrderLayout.read(spark, d).count() == base.count())
    assert(canon(ZOrderLayout.read(spark, d)) == canon(base))
    // describe() surfaces the orphan files for an operator to see
    val st = ZOrderLayout.describe(spark, d)
    assert(st.epoch == 0 && st.uncommittedFiles > 0 && st.deltaFiles == 0)
    // recluster from the crashed state rolls the orphans back FIRST — the
    // torn delta must not be baked into the new table version
    val rd = tmp("zorder_gate_recluster")
    ZOrderLayout.recluster(spark, d, rd, numFiles = 8)
    assert(spark.read.parquet(rd).count() == base.count())
    // the rollback also cleared the source's orphans; the RETRY converges
    assert(ZOrderLayout.append(spark, delta, d, numFiles = 4) == delta.count())
    assert(ZOrderLayout.read(spark, d).count() == li.count())
    assert(canon(ZOrderLayout.read(spark, d)) == canon(li))
    val st2 = ZOrderLayout.describe(spark, d)
    assert(st2.epoch == 1 && st2.uncommittedFiles == 0 && st2.deltaFiles == 4)
  }

  test("empty and single-row inputs write without clustering machinery") {
    val d = tmp("zorder_empty")
    ZOrderLayout.write(spark, li.limit(0), d, "l_extendedprice", "l_orderkey")
    assert(spark.read.parquet(d).count() == 0)
    val d1 = tmp("zorder_one")
    ZOrderLayout.write(spark, li.limit(1), d1, "l_extendedprice", "l_orderkey")
    assert(spark.read.parquet(d1).count() == 1)
  }
}
