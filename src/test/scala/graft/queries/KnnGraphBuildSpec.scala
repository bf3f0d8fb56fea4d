package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental k-NN graph vs a full rebuild: because the hyperplane
  * signatures are deterministic in (bits, tables) and the stored top-k edge
  * list dominates every old-old pair, absorbing a delta must be EXACTLY the
  * full rebuild's graph — row-identical, not recall-approximate.
  */
class KnnGraphBuildSpec extends SparkSpec {

  private val (kk, tbls, bts) = (5, 8, 6)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("delta build ≡ full rebuild, bit-for-bit") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong

    val outFull = java.nio.file.Files.createTempDirectory("knn_full").toString
    // bits pinned on both paths: the full build over MORE vectors would
    // otherwise size its tables differently than the base build did
    KnnGraphBuild.build(spark, e, outFull, kk, tbls, bitsOverride = bts)

    val outDelta = java.nio.file.Files.createTempDirectory("knn_delta").toString
    KnnGraphBuild.build(spark, e.filter(col("vec_id") <= mid), outDelta,
      kk, tbls, bitsOverride = bts)
    val nEdges = KnnGraphBuild.delta(spark, e.filter(col("vec_id") > mid), outDelta)
    assert(nEdges > 0)
    // the returned count is maintained ARITHMETICALLY in the meta (no
    // per-verb merge scan) — it must still equal the true served count
    assert(nEdges == KnnGraphBuild.readGraph(spark, outDelta).count(),
      "meta-tracked edge count diverged from the served merge")

    val full = canon(KnnGraphBuild.readGraph(spark, outFull))
    val delta = canon(KnnGraphBuild.readGraph(spark, outDelta))
    assert(full.nonEmpty)
    assert(delta == full)
  }

  test("graph output matches the q_sim_knn_graph catalog shape and params") {
    val out = java.nio.file.Files.createTempDirectory("knn_shape").toString
    KnnGraphBuild.build(spark, graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding"), out, k = 5, tables = 6)
    val g = KnnGraphBuild.readGraph(spark, out)
    assert(g.columns.toSeq == Seq("q_id", "rnk", "vec_id", "cos"))
    val catalog = graft.SparkEntry.queries("q_sim_knn_graph")(spark, sf001)
    // same knobs (k=5, tables=6, adaptive bits) → same graph
    assert(canon(g) == canon(catalog))
  }

  test("a crashed delta leaves the prior epoch readable and retries cleanly") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val out = java.nio.file.Files.createTempDirectory("knn_crash").toString
    KnnGraphBuild.build(spark, e.filter(col("vec_id") <= mid), out,
      kk, tbls, bitsOverride = bts)
    val base = canon(KnnGraphBuild.readGraph(spark, out))

    // simulate a delta killed mid-write: partial epoch-1 dirs on disk but
    // no committed epoch-1 meta — the commit point never flipped
    val junk = java.nio.file.Paths.get(out, "_graft_state", "edges", "e1")
    java.nio.file.Files.createDirectories(junk)
    java.nio.file.Files.writeString(junk.resolve("part-junk"), "not parquet")

    // prior epoch is untouched and still what readers see
    assert(canon(KnnGraphBuild.readGraph(spark, out)) == base)

    // the retry rewrites epoch 1 and lands on the full-rebuild answer
    KnnGraphBuild.delta(spark, e.filter(col("vec_id") > mid), out)
    val outFull = java.nio.file.Files.createTempDirectory("knn_crash_full").toString
    KnnGraphBuild.build(spark, e, outFull, kk, tbls, bitsOverride = bts)
    assert(canon(KnnGraphBuild.readGraph(spark, out)) ==
      canon(KnnGraphBuild.readGraph(spark, outFull)))
  }

  test("vacuum drops superseded epochs but keeps live sig shards") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val out = java.nio.file.Files.createTempDirectory("knn_vacuum").toString
    KnnGraphBuild.build(spark, e.filter(col("vec_id") <= mid), out,
      kk, tbls, bitsOverride = bts)
    KnnGraphBuild.delta(spark, e.filter(col("vec_id") > mid), out)
    val before = canon(KnnGraphBuild.readGraph(spark, out))
    // the delta wrote a change SHARD over base e0 — both are LIVE (the
    // read-side merge needs them); only the superseded meta vacuums
    assert(KnnGraphBuild.vacuum(spark, out) == 1) // meta/e0
    // current epoch unchanged; graph identical; further deltas still see
    // BOTH sig shards (the empty re-delta proves the state still reads)
    assert(canon(KnnGraphBuild.readGraph(spark, out)) == before)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_graft_state", "edges", "e0")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_graft_state", "eclaims", "e1")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_graft_state", "sigs", "e0")))
    KnnGraphBuild.delta(spark, e.limit(0), out) // no-op still resolves state
  }

  test("edge shards are churn-sized; the fold rewrites a full base and vacuum then reclaims") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
      .localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("knn_shard").toString
    val outFull = java.nio.file.Files.createTempDirectory("knn_shard_full").toString
    Seq(out, outFull).foreach(p => sys.addShutdownHook(
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))))
    KnnGraphBuild.build(spark, e, out, kk, tbls, bitsOverride = bts)
    val baseRows = spark.read.parquet(s"$out/_graft_state/edges/e0").count()
    // EdgeFoldEvery - 1 small deltas stay shards; the next one FOLDS
    val deltas = KnnGraphBuild.EdgeFoldEvery
    (1 to deltas).foreach { i =>
      val d = e.orderBy("vec_id").limit(2)
        .withColumn("vec_id", col("vec_id") + lit(900000L + i * 10))
      KnnGraphBuild.delta(spark, d, out)
      val shardRows = spark.read.parquet(s"$out/_graft_state/edges/e$i").count()
      if (i < deltas) {
        // churn-sized writes: a 2-vector delta touches ≤ (2 + their
        // mirrored endpoints) lists of ≤ k rows — nothing like the base
        assert(shardRows < baseRows / 3,
          s"epoch $i shard must be churn-sized: $shardRows vs base $baseRows")
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
          out, "_graft_state", "eclaims", s"e$i")))
      } else {
        // the fold: a full base, no claims, edgesBase advanced
        assert(shardRows >= baseRows,
          s"fold epoch must hold the full list: $shardRows vs $baseRows")
        assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
          out, "_graft_state", "eclaims", s"e$i")))
      }
    }
    // the folded state ≡ one full rebuild over everything, bit-for-bit
    val all = (1 to deltas).foldLeft(e) { (acc, i) =>
      acc.unionByName(e.orderBy("vec_id").limit(2)
        .withColumn("vec_id", col("vec_id") + lit(900000L + i * 10)))
    }
    KnnGraphBuild.build(spark, all, outFull, kk, tbls, bitsOverride = bts)
    assert(canon(KnnGraphBuild.readGraph(spark, out)) ==
      canon(KnnGraphBuild.readGraph(spark, outFull)))
    // vacuum reclaims everything below the new base
    assert(KnnGraphBuild.vacuum(spark, out) ==
      deltas /* edges e0..e(n-1) */ + (deltas - 1) /* eclaims */ +
        deltas /* meta e0..e(n-1) */)
    assert(canon(KnnGraphBuild.readGraph(spark, out)) ==
      canon(KnnGraphBuild.readGraph(spark, outFull)))
  }

  test("the edge BASE is a_id-range-sorted — a bounded a_id read prunes row groups (metered)") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("knn_sorted").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(out)))
    KnnGraphBuild.build(spark, e, out, kk, tbls, bitsOverride = bts)
    val baseRows = spark.read.parquet(s"$out/_graft_state/edges/e0").count()
    // a point lookup — the shape of the delta's prevRows slice and the
    // delete's claim scan — must not surface the whole base: the pushed
    // equality prunes every row group whose a_id min/max excludes the id
    // (files are range-partitioned and sorted by a_id at build/fold)
    val id = e.orderBy("vec_id").limit(1).head.getLong(0)
    val point = KnnGraphBuild.readEdges(spark, out)
      .filter(col("a_id") === id)
    assert(point.collect().nonEmpty, "fixture id has no list")
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val surfaced = scans(point.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
    info(s"point read surfaced $surfaced of $baseRows base rows")
    // threshold at /2: the range partitioner's sampled boundaries make
    // individual file sizes wobble (observed 595–640 of 2500 across
    // runs) — the receipt is qualitative: a point read must not surface
    // the store (the unsorted layout surfaced all 2500, every run)
    assert(surfaced < baseRows / 2,
      s"sorted base must prune the point read: surfaced $surfaced of $baseRows")
  }

  test("restrictByKey's two branches agree — isin under the cap, broadcast semi above it") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("knn_restrict").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(out)))
    KnnGraphBuild.build(spark, e, out, kk, tbls, bitsOverride = bts)
    val edges = KnnGraphBuild.readEdges(spark, out)
    val ids = Seq(1L, 4L, 9L, 16L).toDF("a_id")
    val viaIsin = canon(KnnGraphBuild.restrictByKey(edges, ids, "a_id"))
    val viaSemi = canon(KnnGraphBuild.restrictByKey(edges, ids, "a_id", cap = 2))
    assert(viaIsin.nonEmpty && viaIsin == viaSemi,
      "the pushed-filter path and the semi-join fallback must agree")
    // and the empty id set yields the empty slice, not a scan
    assert(canon(KnnGraphBuild.restrictByKey(edges,
      ids.limit(0), "a_id")).isEmpty)
  }

  test("delta rejects vec_ids that are LIVE in the graph") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("knn_hwm").toString
    KnnGraphBuild.build(spark, e, out, kk, tbls, bitsOverride = bts)
    // re-inserting ids without tombstoning them first is the one illegal
    // delta (it would double the vertex) — tombstoned ids are legal
    // (KnnGraphDeleteSpec covers the upsert round-trip)
    val ex = intercept[IllegalArgumentException] {
      KnnGraphBuild.delta(spark, e.limit(10), out)
    }
    assert(ex.getMessage.contains("must not be LIVE"))
    // and an empty delta is a no-op, not an error
    KnnGraphBuild.delta(spark, e.limit(0), out)
  }
}
