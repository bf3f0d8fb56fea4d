package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IVF confidence-fallback cap (VERDICT r8 item 6): a noise-heavy query
  * batch — where per-query fallback would silently degrade the whole run to
  * an exact scan — must FAIL LOUDLY above the fallback-fraction cap, and a
  * clustered batch must pass untouched. Mirrors the Jaccard vocab gate's
  * contract: scale cliffs are a loud choice, never a silent degradation.
  */
class IvfFallbackCapSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus: 32 clustered vectors living in dims 0..7 (4 tight clusters on
    * distinct axes, background jitter confined to dims 0..7 — the earlier
    * all-dims jitter leaked ~0.1–0.23 of centroid mass into the noise
    * dims, quietly un-orthogonalizing the noise queries). Noise queries:
    * ids >= 1000, living in dims 8..15 — exactly orthogonal to every
    * corpus vector, so their best centroid cosine is 0 no matter how the
    * quantizer trains: the population the ConfFloor exists to catch.
    */
  private def fixture = {
    val clustered = (0 until 32).map { i =>
      val axis = i % 4
      val v = Array.fill(16)(0.0)
      (0 until 8).foreach(d => v(d) = 0.001 * ((i * 7 + d * 3) % 5))
      v(axis) = 1.0
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val noise = (0 until 10).map { j =>
      val v = Array.fill(16)(0.0f)
      v(8 + (j % 8)) = 1.0f
      ((1000 + j).toLong, v.toSeq)
    }
    (clustered ++ noise).toDF("vec_id", "embedding")
  }

  test("a noise-heavy batch breaks the cap loudly, naming the fractions") {
    val e = intercept[IllegalArgumentException] {
      VectorQueries.ivfTopK(spark, fixture, col("vec_id") >= 1000L,
        k = 3, nprobe = 2, kCells = 4).collect()
    }
    // k-center seeding legitimately grants cells to SOME noise axes (noise
    // vectors are corpus members, and extreme points are exactly what
    // farthest-point selection finds), so not all 10 fall back — but the
    // uncovered axes must, and their fraction must breach the 0.25 cap
    val m = "exact-scan (\\d+) of 10 queries".r.findFirstMatchIn(e.getMessage)
      .getOrElse(fail(s"no fallback fractions in: ${e.getMessage}"))
    assert(m.group(1).toInt > 2, e.getMessage) // > cap · 10
    assert(e.getMessage.contains("maxFallbackFrac"), e.getMessage)
  }

  test("a clustered batch passes under the cap and returns neighbors") {
    val rows = VectorQueries.ivfTopK(spark, fixture, col("vec_id") < 8L,
      k = 3, nprobe = 2, kCells = 4).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) < 8L))
  }

  test("raising the cap knowingly lets the degraded batch run exact") {
    val rows = VectorQueries.ivfTopK(spark, fixture, col("vec_id") >= 1000L,
      k = 3, nprobe = 2, kCells = 4, maxFallbackFrac = 1.0).collect()
    // every noise query fell back to the full scan, so each sees the whole
    // corpus and returns its k best (all cosines 0 to the clustered dims —
    // ranked by id tiebreak, still well-formed)
    assert(rows.groupBy(_.getLong(0)).size == 10)
  }

  test("the physical layout's pruned search shares the cap — loud breach, exact when raised") {
    val d = java.nio.file.Files.createTempDirectory("ivf_cap_layout").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    IndexedLayout.write(spark, fixture, d, kCells = 4)
    val noiseQ = fixture.filter(col("vec_id") >= 1000L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // same guard, same message, through the layout path
    val e = intercept[IllegalArgumentException] {
      IndexedLayout.prunedTopK(spark, d, noiseQ, k = 3, nprobe = 2).collect()
    }
    assert(e.getMessage.contains("maxFallbackFrac"), e.getMessage)
    // raised knowingly: every noise query widens to ALL cells (the exact
    // scan of the layout) and returns a well-formed top-k
    val rows = IndexedLayout.prunedTopK(spark, d, noiseQ, k = 3, nprobe = 2,
      maxFallbackFrac = 1.0).collect()
    assert(rows.groupBy(_.getLong(0)).size == 10)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
    // a clustered batch stays pruned and passes untouched
    val okQ = fixture.filter(col("vec_id") < 8L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assert(IndexedLayout.prunedTopK(spark, d, okQ, k = 3, nprobe = 2)
      .collect().nonEmpty)
  }

  test("the cap holds over a churned layout whose cells are mostly tombstones") {
    val d = java.nio.file.Files.createTempDirectory("ivf_cap_churn").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    IndexedLayout.write(spark, fixture, d, kCells = 4)
    // churn: tombstone 28 of the 32 clustered vectors AND all 10 noise
    // corpus members — every cell is now mostly dead rows
    IndexedLayout.delete(spark,
      fixture.select("vec_id").filter(col("vec_id") >= 4L), d)
    val noiseQ = fixture.filter(col("vec_id") >= 1000L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // the guard is centroid-based, so the breach fires exactly as on the
    // un-churned layout — tombstones must not weaken the loud-failure path
    val e = intercept[IllegalArgumentException] {
      IndexedLayout.prunedTopK(spark, d, noiseQ, k = 3, nprobe = 2).collect()
    }
    assert(e.getMessage.contains("maxFallbackFrac"), e.getMessage)
    // raised knowingly: the exact scan of the churned layout sees ONLY the
    // live survivors — every neighbor is one of ids 0..3, none tombstoned
    val rows = IndexedLayout.prunedTopK(spark, d, noiseQ, k = 3, nprobe = 2,
      maxFallbackFrac = 1.0).collect()
    assert(rows.groupBy(_.getLong(0)).size == 10)
    assert(rows.forall(r => r.getLong(2) < 4L),
      rows.map(_.getLong(2)).distinct.mkString(","))
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
    // a live-cluster query still passes under the cap over the churned cells
    val okQ = fixture.filter(col("vec_id") < 4L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val okRows = IndexedLayout.prunedTopK(spark, d, okQ, k = 3, nprobe = 2)
      .collect()
    assert(okRows.nonEmpty && okRows.forall(_.getLong(2) < 4L))
    // and after compaction removes the dead rows the answers are identical
    val beforeCompact = rows.map(_.toSeq.mkString("|")).sorted.toSeq
    IndexedLayout.compact(spark, d)
    val afterCompact = IndexedLayout.prunedTopK(spark, d, noiseQ, k = 3,
      nprobe = 2, maxFallbackFrac = 1.0).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(afterCompact == beforeCompact)
  }

  test("the catalog query's real batch stays under the default cap") {
    // vec_id < 10 at sf0.001 must not trip the gate — the cap exists for
    // adversarial batches, not the everyday path
    val rows = graft.SparkEntry.queries("q_sim_ivf_kmeans")(spark, sf001).collect()
    assert(rows.nonEmpty)
  }
}
