package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental IVF graph vs a full rebuild under the SAME pinned
  * quantizer: cell assignment is deterministic in the centroid table, which
  * buildIvf writes once as immutable index state (the FAISS contract —
  * add() never retrains), so absorbing a delta must be EXACTLY the full
  * rebuild's graph — row-identical, the same standard KnnGraphBuildSpec
  * holds the LSH build to.
  */
class KnnGraphBuildIvfSpec extends SparkSpec {

  private val (kk, np, nc) = (5, 3, 8)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("IVF delta build ≡ full rebuild under the stored quantizer, bit-for-bit") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong

    val outDelta = java.nio.file.Files.createTempDirectory("knnivf_delta").toString
    KnnGraphBuild.buildIvf(spark, e.filter(col("vec_id") <= mid), outDelta,
      kk, np, cellsOverride = nc)
    val nEdges = KnnGraphBuild.deltaIvf(spark, e.filter(col("vec_id") > mid), outDelta)
    assert(nEdges > 0)

    // the rebuild oracle pins the quantizer the delta'd state stored: the
    // quantizer is part of the index, so "full rebuild" means re-pairing
    // and re-scoring everything under it — not retraining it
    val centroids = KnnGraphBuild.readCentroids(spark, outDelta)
    val outFull = java.nio.file.Files.createTempDirectory("knnivf_full").toString
    KnnGraphBuild.buildIvf(spark, e, outFull, kk, np,
      centroidsOverride = centroids)

    val full = canon(KnnGraphBuild.readGraph(spark, outFull))
    val delta = canon(KnnGraphBuild.readGraph(spark, outDelta))
    assert(full.nonEmpty)
    assert(delta == full)
  }

  test("IVF build matches the q_sim_knn_graph_ivf catalog query") {
    // same knobs (k=5, nprobe=3, adaptive cell count, one Lloyd pass) →
    // same graph: the build and the catalog query share one pipeline copy
    val out = java.nio.file.Files.createTempDirectory("knnivf_shape").toString
    KnnGraphBuild.buildIvf(spark, graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding"), out, k = 5, nprobe = 3)
    val g = KnnGraphBuild.readGraph(spark, out)
    assert(g.columns.toSeq == Seq("q_id", "rnk", "vec_id", "cos"))
    val catalog = graft.SparkEntry.queries("q_sim_knn_graph_ivf")(spark, sf001)
    assert(canon(g) == canon(catalog))
  }

  test("method mismatch is loud in both directions") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val low = e.filter(col("vec_id") <= mid)
    val high = e.filter(col("vec_id") > mid)

    val ivfOut = java.nio.file.Files.createTempDirectory("knnivf_mm1").toString
    KnnGraphBuild.buildIvf(spark, low, ivfOut, kk, np, cellsOverride = nc)
    val ex1 = intercept[IllegalArgumentException] {
      KnnGraphBuild.delta(spark, high, ivfOut)
    }
    assert(ex1.getMessage.contains("method=ivf"))

    val lshOut = java.nio.file.Files.createTempDirectory("knnivf_mm2").toString
    KnnGraphBuild.build(spark, low, lshOut, kk, tables = 8, bitsOverride = 6)
    val ex2 = intercept[IllegalArgumentException] {
      KnnGraphBuild.deltaIvf(spark, high, lshOut)
    }
    assert(ex2.getMessage.contains("method=lsh"))
  }

  test("IVF delta rejects LIVE ids and no-ops on empty") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("knnivf_hwm").toString
    KnnGraphBuild.buildIvf(spark, e, out, kk, np, cellsOverride = nc)
    val ex = intercept[IllegalArgumentException] {
      KnnGraphBuild.deltaIvf(spark, e.limit(10), out)
    }
    assert(ex.getMessage.contains("must not be LIVE"))
    KnnGraphBuild.deltaIvf(spark, e.limit(0), out) // no-op, not an error
  }

  test("buildAuto picks the side of the threshold and pins its method") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val low = e.filter(col("vec_id") <= mid)
    val high = e.filter(col("vec_id") > mid)

    // below the threshold: LSH state — deltaIvf must refuse it
    val lshOut = java.nio.file.Files.createTempDirectory("knnauto_lsh").toString
    KnnGraphBuild.buildAuto(spark, low, lshOut, kk)
    KnnGraphBuild.delta(spark, high, lshOut)
    assert(intercept[IllegalArgumentException] {
      KnnGraphBuild.deltaIvf(spark, e.limit(0), lshOut)
    }.getMessage.contains("method=lsh"))

    // a forced threshold below the corpus: IVF state — delta must refuse
    val ivfOut = java.nio.file.Files.createTempDirectory("knnauto_ivf").toString
    KnnGraphBuild.buildAuto(spark, low, ivfOut, kk, nprobe = np,
      thresholdOverride = 1L)
    KnnGraphBuild.deltaIvf(spark, high, ivfOut)
    assert(intercept[IllegalArgumentException] {
      KnnGraphBuild.delta(spark, e.limit(0), ivfOut)
    }.getMessage.contains("method=ivf"))
  }

  test("vacuum works on an IVF state and keeps live assignment shards") {
    val e = graft.Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val mid = e.agg(expr("percentile(vec_id, 0.5)")).head.getDouble(0).toLong
    val out = java.nio.file.Files.createTempDirectory("knnivf_vac").toString
    KnnGraphBuild.buildIvf(spark, e.filter(col("vec_id") <= mid), out,
      kk, np, cellsOverride = nc)
    KnnGraphBuild.deltaIvf(spark, e.filter(col("vec_id") > mid), out)
    val before = canon(KnnGraphBuild.readGraph(spark, out))
    // base e0 + the delta's change shard are both live; only meta/e0 goes
    assert(KnnGraphBuild.vacuum(spark, out) == 1) // meta/e0
    assert(canon(KnnGraphBuild.readGraph(spark, out)) == before)
    // sig AND assignment shards survive: both are live delta inputs
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_graft_state", "sigs", "e0")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_graft_state", "assign", "e0")))
    KnnGraphBuild.deltaIvf(spark, e.limit(0), out)
  }
}
