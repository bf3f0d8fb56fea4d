package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the IVF confidence floor: per-query BEST centroid
  * cosine for the catalog batch (vec_id < 10) at each sf, under the current
  * quantizer (k-center seeding + Lloyd). The ConfFloor in ivfTopK separates
  * "query belongs to a cluster" from "query is quantizer-invisible noise" —
  * this prints the two populations so the floor is a measured constant, not
  * a guess. `runMain graft.queries.IvfConfProbe [sfDir...]`.
  */
object IvfConfProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def stats(tag: String, e: org.apache.spark.sql.DataFrame,
        qPred: org.apache.spark.sql.Column, kCells: Int, iters: Int): Unit = {
      val centroids = graft.functions.VectorIndex
        .kmeansCentroids(spark, e, k = kCells, iters = iters)
      val rows = e.filter(qPred)
        .crossJoin(broadcast(centroids))
        .withColumn("csim", cosineSimilarity(
          col("embedding").cast("array<double>"), col("centroid")))
        .groupBy("vec_id").agg(max("csim").as("best"), avg("csim").as("av"))
        .orderBy("vec_id")
        .collect().map(r => f"${r.getLong(0)}:b${r.getDouble(1)}%.3f/m${
          r.getDouble(1) - r.getDouble(2)}%.3f")
      println(s"IVFCONF $tag iters=$iters best/margin=[${rows.mkString(", ")}]")
    }
    dirs.foreach { dir =>
      Seq(1, 2).foreach { iters =>
        stats(dir, Tables.embeddings(spark, dir).select("vec_id", "embedding"),
          col("vec_id") < 10, kCells = 8, iters = iters)
      }
    }
    // the IvfFallbackCapSpec noise fixture: clustered corpus in dims 0..7,
    // noise queries in dims 8..15 — the population the floor must CATCH
    import spark.implicits._
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
    val fix = (clustered ++ noise).toDF("vec_id", "embedding")
    stats("fixture-noiseq", fix, col("vec_id") >= 1000L, kCells = 4, iters = 1)
    stats("fixture-clusteredq", fix, col("vec_id") < 10L, kCells = 4, iters = 1)

    // recall sweep for the q_sim_ivf_kmeans knobs at sf0.001: which
    // (kCells, nprobe, iters) clears the 0.9 floor, and at what touched
    // fraction (nprobe/kCells) — the honest cost of diffuse clusters
    val sfDir = dirs.head
    def recallOf(kCells: Int, nprobe: Int, iters: Int): Double = {
      val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("rnk") <= 3).select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairSet(graft.SparkEntry.queries("q_sim_topk")(spark, sfDir))
      val ivf = pairSet(VectorQueries.ivfTopK(spark, e, col("vec_id") < 10,
        k = 3, nprobe = nprobe, kCells = kCells, iters = iters))
      (exact & ivf).size.toDouble / exact.size
    }
    Seq((8, 4, 1), (8, 5, 1), (8, 4, 2), (8, 5, 2), (16, 6, 1), (16, 8, 1),
        (16, 8, 2), (4, 2, 1), (4, 3, 1)).foreach { case (kc, np, it) =>
      println(f"IVFSWEEP kCells=$kc nprobe=$np iters=$it frac=${
        np.toDouble / kc}%.2f recall@3=${recallOf(kc, np, it)}%.3f")
    }

    // corpus-side multi-assignment variant: each corpus vector posted to
    // its top-`assign` cells (spilled postings), queries probe `nprobe` —
    // candidate volume ~assign·nprobe/kCells of the corpus
    def recallMulti(kCells: Int, nprobe: Int, assign: Int, iters: Int): Double = {
      val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val sigs = VectorQueries.nrmFrame(e)
      val centroids = graft.functions.VectorIndex
        .kmeansCentroids(spark, sigs, kCells, iters)
      val cells = VectorQueries.ivfAssign(sigs, centroids, assign)
        .select("vec_id", "cell").join(sigs, "vec_id")
      val probes = VectorQueries.ivfAssign(
        sigs.filter(col("vec_id") < 10), centroids, nprobe)
        .select(col("vec_id").as("q_id"), col("cell"))
      val q = sigs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_n")).join(probes, "q_id")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(col("cos_r").desc, col("vec_id").asc)
      val got = broadcast(q).join(cells, Seq("cell"))
        .filter(col("q_id") =!= col("vec_id"))
        .select("q_id", "vec_id", "q_emb", "q_n", "embedding", "nrm").distinct()
        .withColumn("cos_r", round(cosineWithNorms(
          col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("rnk") <= 3).select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairSet(graft.SparkEntry.queries("q_sim_topk")(spark, sfDir))
      (exact & got).size.toDouble / exact.size
    }
    Seq((8, 2, 2, 1), (8, 3, 2, 1), (8, 4, 2, 1), (8, 3, 3, 1), (16, 4, 2, 1),
        (16, 6, 2, 1), (16, 4, 3, 1)).foreach { case (kc, np, as, it) =>
      println(f"IVFSWEEP-MULTI kCells=$kc nprobe=$np assign=$as iters=$it " +
        f"frac~${np.toDouble * as / kc}%.2f recall@3=${recallMulti(kc, np, as, it)}%.3f")
    }
    spark.stop()
  }
}
