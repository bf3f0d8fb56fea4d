package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the k-NN graph's scale behavior: candidate-pair
  * counts and stage timings at the base corpus and the ScaleProbe scaled
  * corpus, per (tables, bits) config.
  * `runMain graft.queries.KnnProbe [scaledDir] [baseDir]`.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val scaled = args.headOption.getOrElse("/tmp/graft_scale_x5")
    val base = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq(base -> "base", scaled -> "scaled").foreach { case (dir, tag) =>
      val e = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val n = e.count()
      Seq(6, 8).foreach { tables =>
        val bits = VectorQueries.adaptiveBits(n)
        val sigs = VectorQueries.sigFrame(e, bits, tables).localCheckpoint()
        val buckets = VectorQueries.bucketsOf(sigs)
        // bucket occupancy skew
        val occ = buckets.groupBy("tbl", "bucket").count()
          .agg(max("count").as("mx"), avg("count").as("av"),
            expr("percentile(count, 0.99)").as("p99"), count(lit(1)).as("nbuckets"))
          .head()
        var t0 = System.nanoTime()
        val cand = VectorQueries.selfCandidates(buckets, bits)
          .localCheckpoint()
        val nc = cand.count()
        val tCand = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val scored = VectorQueries.scorePairs(cand, sigs, sigs)
        val edges = VectorQueries.topKEdges(scored, 5)
        val ne = edges.count()
        val tScore = (System.nanoTime() - t0) / 1e9
        println(f"KNNPROBE $tag n=$n tables=$tables bits=$bits " +
          f"maxBucket=${occ.getAs[Long]("mx")} avgBucket=${occ.getAs[Double]("av")}%.1f " +
          f"p99=${occ.getAs[Double]("p99")}%.1f nBuckets=${occ.getAs[Long]("nbuckets")} " +
          f"cand=$nc candSec=$tCand%.2f edges=$ne scoreSec=$tScore%.2f")
      }
    }

    // recall at the scaled corpus (the floor is only spec-asserted at small
    // sf): catalog config (tables=6, adaptive bits) vs brute force
    val approx = graft.Recall.pairs(
      VectorQueries.knnGraph(spark, scaled, k = 5, tables = 6).collect(), 5)
    val exact = graft.Recall.pairs(
      VectorQueries.bruteKnnGraph(spark, scaled, 5).collect(), 5)
    println(f"KNNPROBE scaled recall@5=${graft.Recall.of(exact, approx)}%.3f")
    spark.stop()
  }
}
