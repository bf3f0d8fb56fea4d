package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for LLM training-data prep: tokenization,
  * shingling, MinHash/SimHash signatures, language-ID and quality heuristics,
  * document fingerprinting. All pure Catalyst higher-order-function
  * compositions — distributed, codegen-friendly, and reproducible in any
  * engine (hashes derive from md5 over explicit strings, not engine-private
  * hash functions, so the DuckDB oracle can recompute them bit-for-bit).
  */
object TextFunctions {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles: ["a b c d"] with n=2 → ["a b","b c","c d"];
    * shorter-than-n docs yield the whole doc as one shingle.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** One MinHash value: min over shingles of md5(seed:shingle). md5 output
    * is uniformly distributed hex, so the lexicographic min is a uniform
    * min-hash; distinct seeds give independent permutations.
    */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat_ws(":", lit(seed), s))))

  /** k-seed MinHash signature, joined to one string (band-friendly). */
  def minhashSignature(sh: Column, k: Int): Column =
    concat_ws("|", (0 until k).map(minhash(sh, _)): _*)

  /** Native-expression twin of `array(seeds.map(minhash(shingles(tokens(
    * text), n), _)))` — one codegen'd kernel call per row instead of the
    * interpreted HOF tree (see [[MinHashSig]]; parity asserted in
    * MinHashSigSpec).
    */
  def minhashSigFast(text: Column, n: Int, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.col(MinHashSig(Bridge.expr(text), n, k))
  }

  /** nbits-bit SimHash over (frequency-weighted) tokens. Bit i of a token's
    * hash is bit (i%4) of hex digit (i/4) of its md5; the simhash bit is the
    * sign of Σ_tokens (2·bit−1).
    */
  def simhash(toks: Column, nbits: Int): Column = {
    // packed into one Long: bit 63 is the sign and `1L << i` wraps at 64
    require(nbits > 0 && nbits <= 63, s"simhash supports 1..63 bits, got $nbits")
    val bitCols = (0 until nbits).map { i =>
      def digit(t: Column): Column =
        conv(substring(md5(t), i / 4 + 1, 1), 16, 10).cast("int")
      val contrib = aggregate(
        toks,
        lit(0),
        (acc, t) => acc + (shiftright(digit(t), i % 4) % 2) * 2 - 1)
      when(contrib >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Native-expression twin of `simhash(tokens(text), nbits)` — one md5
    * per token instead of one per (token × bit) and no interpreted lambda
    * trees (see [[SimHashSig]]; parity asserted in SimHashSigSpec).
    */
  def simhashFast(text: Column, nbits: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.col(SimHashSig(Bridge.expr(text), nbits))
  }

  /** Hamming distance between two simhash longs. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** (v, n) runs of a SORTED array — the per-document value histogram an
    * explode → groupBy(doc_id, value) used to produce, computed
    * row-locally with zero exchanges (r18, guide §2.4): starts are the
    * 1-based boundaries where the sorted value changes; pairing each
    * start with the next gives (value, run length). `srt` must be a
    * projected ATTRIBUTE (not an inline array_sort) so the sort runs
    * once per row, not once per lambda element.
    */
  def runs(srt: Column): Column = {
    val n = size(srt)
    // null-SAFE boundary (ADVICE r18): a =!= b is null for a null element,
    // which filter() treats as false — a null run would silently merge
    // into its neighbor's count; <=> counts it as its own run instead.
    val starts = filter(sequence(lit(1), n),
      i => (i === 1) || !(element_at(srt, i) <=> element_at(srt, i - 1)))
    val body = zip_with(starts,
      concat(slice(starts, lit(2), size(starts)), array(n + 1)),
      (a, b) => struct(element_at(srt, a).as("v"), (b - a).cast("long").as("n")))
    // empty/null guard (ADVICE r18): n = 0 makes sequence(1, 0) the
    // DESCENDING [1, 0] and element_at(srt, 0) a hard error — short-circuit
    // to null (explode consumers skip the row, the old explode→groupBy
    // semantics for an empty document; null text takes the same branch).
    // For every non-empty array the branch condition is true and `body`
    // is the unguarded r18 expression, bit for bit.
    when(n > 0, body)
  }

  /** Native PPJoin prefix over a distinct-token array ([[TokenPrefix]];
    * parity with the explode→df-join→window form asserted in
    * TokenPrefixSpec). `dfs` is the vocabulary-sized document-frequency
    * table, shipped as a plan constant.
    */
  def tokenPrefix(toks: Column, dfs: Map[String, Long], t: Double): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.col(TokenPrefix(Bridge.expr(toks), dfs, t))
  }

  /** Tiny deterministic stopword lists per language for the n-gram/stopword
    * language-ID heuristic. (The testdata vocabulary is synthetic; what the
    * oracle checks is the scoring machinery, not linguistics.)
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "data", "table"),
    "de" -> Seq("der", "die", "das", "und", "zu", "batch", "window"),
    "fr" -> Seq("le", "la", "de", "et", "spark", "join"),
    "es" -> Seq("el", "la", "de", "y", "query", "filter"))

  /** Count of tokens found in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_).cast("string")): _*)))

  /** argmax language by stopword hits; ties → earlier list; 0 hits → 'und'
    * (undetermined).
    */
  def langId(toks: Column): Column = {
    val scored = stopwords.map { case (lang, words) =>
      struct(stopwordHits(toks, words).as("score"), lit(lang).as("lang"))
    }
    // fold keeping the max score; strictly-greater keeps the earliest lang on ties
    val best = scored.reduce((a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a))
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Native one-pass stats struct (n_tokens, sum_tok_len, sw_hits,
    * non_alnum, text_len) — see [[TokenStats]]; parity with the HOF
    * columns below asserted in TokenStatsSpec.
    */
  def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.col(TokenStats(Bridge.expr(text), stopwords.flatMap(_._2).distinct))
  }

  /** The blended 0-1 quality score from a [[tokenStats]] struct — the same
    * arithmetic (and therefore bit-identical doubles) as [[qualityScore]].
    */
  def qualityFromStats(ts: Column): Column = {
    val lenScore = least(ts.getField("n_tokens").cast("double") / 100.0, lit(1.0))
    val swScore = least(
      ts.getField("sw_hits").cast("double") / ts.getField("n_tokens") * 5.0,
      lit(1.0))
    // text_len = 0 (empty doc) must not poison the score with NaN: Spark's
    // x/0 is NaN but DuckDB's is NULL, so a NaN here breaks cross-engine
    // parity the moment the score is cast/rounded. nullif + coalesce gives
    // penalty 0 on BOTH engines (no chars ⇒ nothing to penalize).
    val penalty = coalesce(
      ts.getField("non_alnum").cast("double") / nullif(ts.getField("text_len"), lit(0)),
      lit(0.0))
    greatest(lit(0.0), lenScore * 0.5 + swScore * 0.5 - penalty)
  }

  /** Quality heuristics: token count, mean token length, stopword ratio,
    * non-alphanumeric character ratio, and a blended 0-1 score.
    */
  def nTokens(text: Column): Column = size(tokens(text))

  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val all = stopwords.flatMap(_._2).distinct
    stopwordHits(t, all).cast("double") / size(t)
  }

  /** NULL (not NaN, not a thrown DIVIDE_BY_ZERO under ANSI mode) for empty
    * text — the same answer DuckDB's x/0 gives, so the ratio stays
    * cross-engine comparable.
    */
  def nonAlnumRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
      nullif(length(text), lit(0))

  def qualityScore(text: Column): Column = {
    val lenScore = least(nTokens(text).cast("double") / 100.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    // same text_len=0 guard as qualityFromStats (bit-parity asserted in
    // TokenStatsSpec, including the "" literal)
    val punctPenalty = coalesce(nonAlnumRatio(text), lit(0.0))
    greatest(lit(0.0), lenScore * 0.5 + swScore * 0.5 - punctPenalty)
  }

  /** Winnowing-style fingerprint: min md5 over character 8-grams at stride 4
    * (cheap, deterministic, robust to small edits at the ends).
    */
  def fingerprint(text: Column): Column = {
    val t = lower(trim(text))
    val grams = transform(
      sequence(lit(1), greatest(floor((length(t) - 4) / 4).cast("int"), lit(1))),
      i => substring(t, (i - 1) * 4 + 1, lit(8)))
    array_min(transform(grams, g => md5(g)))
  }

  /** BPE-ish regex token count: runs of letters, runs of digits, or a single
    * non-space symbol — a common pre-tokenizer shape.
    */
  def regexTokenCount(text: Column): Column =
    size(expr_regexp_extract_all(lower(text)))

  private def expr_regexp_extract_all(c: Column): Column =
    regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
}
