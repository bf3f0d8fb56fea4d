package graft.queries

import graft.SparkSpec

/** Independent (plain-Scala) oracles for the corpus-quality operators:
  * recompute each metric for sampled docs from the raw text with ordinary
  * collections code and compare to the query output. This is deliberately a
  * SECOND implementation — the DuckDB oracle checks cross-engine hash
  * parity, this spec checks the metric definitions themselves.
  */
class CorpusQualitySpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  private lazy val docs: Map[Long, String] =
    spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq

  private def r4(d: Double): Double = BigDecimal(d)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_text_repetition matches a collections-code recompute") {
    val rows = run("q_text_repetition").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("top_bigram_frac"), r.getAs[Double]("dup_bigram_frac"),
          r.getAs[Double]("uniq_tok_ratio"))).toMap
    assert(rows.size == docs.size)
    docs.take(50).foreach { case (id, text) =>
      val t = toks(text)
      val bg = t.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bg.groupBy(identity).view.mapValues(_.size)
      val top = counts.values.max.toDouble / bg.size
      val dup = counts.values.filter(_ >= 2).sum.toDouble / bg.size
      val uniq = t.distinct.size.toDouble / t.size
      val (gotTop, gotDup, gotUniq) = rows(id)
      assert(gotTop == r4(top), s"doc $id top_bigram_frac")
      assert(gotDup == r4(dup), s"doc $id dup_bigram_frac")
      assert(gotUniq == r4(uniq), s"doc $id uniq_tok_ratio")
    }
  }

  test("q_text_entropy matches a collections-code recompute") {
    val rows = run("q_text_entropy").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Double]("entropy"))).toMap
    assert(rows.size == docs.size)
    docs.take(50).foreach { case (id, text) =>
      val t = toks(text)
      val n = t.size
      // the query's rounded-term formula: H = ln(N) - Σ n·round6(ln n) / N
      val s = t.groupBy(identity).values
        .map(g => g.size * BigDecimal(math.log(g.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum
      val h = math.log(n) - s.toDouble / n
      val (gotN, gotH) = rows(id)
      assert(gotN == n, s"doc $id n_toks")
      assert(gotH == r4(h), s"doc $id entropy ($gotH vs ${r4(h)})")
      // max entropy (all tokens distinct) is exactly ln(N) — compare after
      // the same 4-decimal rounding the query applies
      assert(gotH >= 0 && gotH <= r4(math.log(n)), s"doc $id entropy range")
    }
  }

  test("q_corpus_decontam rates are consistent and bounded") {
    val rows = run("q_corpus_decontam").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hit, rate) = (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_overlap"), r.getAs[Double]("contam_rate"))
      assert(n > 0 && hit >= 0 && hit <= n)
      assert(rate == r4(hit.toDouble / n))
    }
  }

  test("q_text_boilerplate groups match a brute-force prefix count") {
    val expected = docs.toSeq
      .map { case (id, text) => (toks(text).take(2).mkString(" "), id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size >= 2)
    val rows = run("q_text_boilerplate").collect()
      .map(r => r.getAs[String]("prefix") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"))).toMap
    assert(rows.keySet == expected.keySet)
    rows.foreach { case (p, (n, first)) =>
      assert(n == expected(p).size, s"prefix '$p' n_docs")
      assert(first == expected(p).min, s"prefix '$p' first_doc")
    }
  }

  test("q_lm_score: positive, bounded by the smoothing floor, broadcast plan") {
    val out = run("q_lm_score")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      // max possible term is the unseen-token floor -ln(1/(N+V)); N+V is
      // comfortably under e^15 at any test sf
      assert(nll > 0 && nll < 15, s"doc ${r.get(0)}: avg_nll $nll")
    }
    // the fitted model must join broadcast, not shuffle, onto the tokens
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "LM model join should broadcast")
  }
}
