package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for q_sim_topk_pq's job chain (VERDICT r8 item 2):
  * time each driver-visible step of the PQ pipeline separately so the trim
  * targets the measured cost, not the guessed one.
  * `runMain graft.queries.PqProbe [sfDir]`.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorIndex
    import graft.functions.VectorFunctions._

    // warm codegen/JIT once end to end
    graft.SparkEntry.queries("q_sim_topk_pq")(spark, dir).count()

    (1 to 2).foreach { pass =>
      val m = 8; val dim = 64; val kcb = 16
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"PQPROBE pass=$pass $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val e = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
      val unit = e.withColumn("n", l2Norm(col("embedding")))
        .select(col("vec_id"),
          when(col("n") === 0, col("embedding").cast("array<double>"))
            .otherwise(transform(col("embedding"),
              x => x.cast("double") / col("n"))).as("embedding"))
      // the r8 shape: checkpoint the subvector frame, train distributed
      val sv = t("checkpoint_sv") {
        VectorIndex.subvectors(
          unit.repartition(spark.sparkContext.defaultParallelism), m, dim)
          .localCheckpoint()
      }
      val distBooks = t("train_dist") {
        VectorIndex.pqCodebooks(spark, sv, m, kcb, iters = 1)
      }
      // the r9 shape: no checkpoint, driver-side Lloyd on the bounded sample
      val drvBooks = t("train_driver") {
        VectorIndex.pqCodebooksDriver(spark,
          VectorIndex.subvectors(unit, m, dim), m, kcb, iters = 1,
          subDim = dim / m)
      }
      t("full_query") {
        graft.SparkEntry.queries("q_sim_topk_pq")(spark, dir).count()
      }
      val _ = (distBooks, drvBooks)
    }
    spark.stop()
  }
}
