package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The frozen BPE tokenizer: the pinned merge table IS what training on
  * the fixture produces (artifact ≡ procedure), the Column replace chain
  * IS the reference Sennrich encoder over the entire fixture vocabulary
  * (plumbing ≡ algorithm), and the chain's tricky cases (chained merges,
  * boundary sharing, rule ordering) match hand-computed answers.
  */
class BpeTokenizerSpec extends SparkSpec {

  test("the pinned merge table re-derives from the fixture corpus, exactly") {
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    val derived = BpeTokenizer.trainOnCorpus(spark, docs, nMerges = 48)
    assert(derived == BpeTokenizer.Merges,
      "PinnedMerges drifted from the training procedure — re-run graft.BpeTrain")
    assert(BpeTokenizer.Merges.size == 48)
  }

  test("the replace chain equals the reference encoder over the ENTIRE fixture vocabulary") {
    import spark.implicits._
    val vocab = graft.Tables.documents(spark, sf001)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .distinct()
    val got = vocab
      .select(col("word"), BpeTokenizer.bpeCountCol(col("word")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (w, n) =>
      val ref = BpeTokenizer.encode(w, BpeTokenizer.Merges).length
      assert(n == ref, s"word '$w': chain=$n reference=$ref")
    }
  }

  test("hand-computed merge semantics: chained merges, rule order, self-products") {
    import spark.implicits._
    // rules: 1:(a,a), 2:(aa,b) — rank order matters and a rule must merge
    // chained occurrences left-to-right without consuming boundaries
    val rules = Seq(("a", "a"), ("aa", "b"))
    def cnt(w: String): Int = {
      Seq(w).toDF("word")
        .select(BpeTokenizer.bpeCountCol(col("word"), rules).as("n"))
        .head.getInt(0)
    }
    assert(cnt("aaaa") == 2) // aa|aa — the single-space scheme would give 3
    assert(cnt("aaa") == 2) // aa|a
    assert(cnt("aaaaa") == 3) // aa|aa|a
    assert(cnt("aab") == 1) // aa then aab
    assert(cnt("aabaab") == 2) // aab|aab via rank order
    assert(cnt("ab") == 2) // (a,b) is NOT a rule
    assert(cnt("x") == 1 && cnt("xyz") == 3)
    // and each equals the reference encoder
    Seq("aaaa", "aaa", "aaaaa", "aab", "aabaab", "ab", "x", "xyz")
      .foreach(w => assert(cnt(w) == BpeTokenizer.encode(w, rules).length, w))
  }

  test("subword counts diverge from whitespace counts in the direction budgets care about") {
    // every word is ≥1 piece and ≤ its char count; rare/unmergeable text
    // costs MORE bpe tokens per word than common text — the systematic
    // whitespace-vs-subword divergence q_token_bpe exists to expose
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    val words = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("word"))
    val agg = words
      .withColumn("n", BpeTokenizer.bpeCountCol(col("word")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws"), sum("n").as("bpe"))
      .agg(sum("ws").as("ws"), sum("bpe").as("bpe")).head
    val (ws, bpe) = (agg.getLong(0), agg.getLong(1))
    assert(bpe >= ws, s"bpe=$bpe < ws=$ws — a word is at least one piece")
    assert(bpe > ws, "48 merges cannot compress every word to one piece")
  }
}
