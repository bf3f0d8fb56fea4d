package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TokenStats (native one-pass kernel) must be value-identical to the HOF
  * column pipeline it replaces — asserted field by field over the real
  * corpus plus adversarial literals (empty, whitespace-only, unicode,
  * punctuation-heavy).
  */
class TokenStatsSpec extends SparkSpec {
  import TextFunctions._

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.select(
        col("text"),
        tokenStats(col("text")).as("ts"),
        nTokens(col("text")).as("h_n"),
        meanTokenLen(col("text")).as("h_mean"),
        stopwordRatio(col("text")).as("h_sw"),
        nonAlnumRatio(col("text")).as("h_na"),
        qualityScore(col("text")).as("h_q"),
        qualityFromStats(tokenStats(col("text"))).as("n_q"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = r.getStruct(1)
      val label = r.getString(0).take(40)
      assert(ts.getAs[Int]("n_tokens") == r.getAs[Int]("h_n"), s"n_tokens: $label")
      val mean = ts.getAs[Int]("sum_tok_len").toDouble / ts.getAs[Int]("n_tokens")
      assert(mean == r.getAs[Double]("h_mean") ||
        (mean.isNaN && r.getAs[Double]("h_mean").isNaN), s"mean_tok_len: $label")
      val sw = ts.getAs[Int]("sw_hits").toDouble / ts.getAs[Int]("n_tokens")
      assert(sw == r.getAs[Double]("h_sw"), s"sw_ratio: $label")
      if (ts.getAs[Int]("text_len") == 0) {
        // empty text: the guarded ratio is NULL (DuckDB-parity), never NaN
        // and never an ANSI DIVIDE_BY_ZERO
        assert(r.isNullAt(r.fieldIndex("h_na")), s"nonalnum_ratio: $label")
      } else {
        val na = ts.getAs[Int]("non_alnum").toDouble / ts.getAs[Int]("text_len")
        assert(na == r.getAs[Double]("h_na") ||
          (na.isNaN && r.getAs[Double]("h_na").isNaN), s"nonalnum_ratio: $label")
      }
      assert(r.getAs[Double]("n_q") == r.getAs[Double]("h_q") ||
        (r.getAs[Double]("n_q").isNaN && r.getAs[Double]("h_q").isNaN),
        s"quality: $label")
    }
  }

  test("native kernel matches the HOF pipeline on the corpus") {
    compare(spark.read.parquet(s"$sf001/documents.parquet"))
  }

  test("native kernel matches the HOF pipeline on edge-case literals") {
    import spark.implicits._
    compare(Seq(
      "the quick brown fox", "  padded   whitespace  ", "UPPER lower MiXeD",
      "punct!!! 100% [sure]?", "héllo wörld über naïve", "123 456 a1b2",
      "single", " ", "a", "the the the the", "", "!!!"
    ).toDF("text"))
  }

  test("the kernel stays inside whole-stage codegen") {
    val q = spark.read.parquet(s"$sf001/documents.parquet")
      .select(tokenStats(col("text")).as("ts"))
    q.collect()
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [token_stats"), p)
  }
}
