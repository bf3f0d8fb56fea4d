package graft.queries

import graft.{Canon, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-quality operators of a training-data pipeline beyond per-document
  * scoring heuristics: repetition metrics (the Gopher/MassiveText quality
  * rules, token form), token-distribution entropy, benchmark decontamination
  * (train/test n-gram overlap), shared-prefix boilerplate detection, and
  * unigram language-model scoring of held-out docs.
  *
  * Reference analog: none (the reference syncs single records); these extend
  * SURVEY.md §2.B-LLM per the build brief's training-pipeline mandate.
  *
  * Cross-engine float determinism: any score summed ACROSS rows (entropy,
  * LM negative log-likelihood) rounds each term to 6 decimals and sums in
  * exact decimal — parallel double summation is order-dependent, so raw
  * double sums would never hash-match a sequential engine. Per-row ratios
  * of integers are computed identically everywhere and only need the final
  * round(·, 4).
  */
object QualityQueries {
  import Canon._
  import TextFunctions._
  import TextQueries.duckToks

  /** DuckDB bigram shingles matching shingles(toks, 2). */
  private val duckBigrams =
    s"""CASE WHEN len($duckToks) < 2 THEN [array_to_string($duckToks, ' ')]
        ELSE list_transform(range(1, len($duckToks)),
             i -> array_to_string(($duckToks)[i:i+1], ' ')) END"""

  /** DuckDB 5-gram shingles matching shingles(toks, 5) (same as TextQueries). */
  private val duck5grams =
    s"""CASE WHEN len($duckToks) < 5 THEN [array_to_string($duckToks, ' ')]
        ELSE list_transform(range(1, len($duckToks) - 3),
             i -> array_to_string(($duckToks)[i:i+4], ' ')) END"""

  /** Run-length counts of a SORTED array — the per-document multiset
    * histogram an explode → groupBy(doc_id, value) used to produce,
    * computed row-locally with zero exchanges (r18, guide §2.4): starts
    * are the 1-based boundaries where the sorted value changes; pairing
    * each start with the next gives the run lengths. `srt` must be a
    * projected ATTRIBUTE (not an inline array_sort) so the sort runs once
    * per row, not once per lambda element.
    */
  private def runCounts(srt: Column): Column =
    transform(TextFunctions.runs(srt), r => r.getField("n"))

  /** Σ round(ln n, 6)·n over run-length counts, accumulated in exact
    * DECIMAL — the same terms the doc_id groupBy summed; decimal addition
    * is exact, so regrouping cannot change a digit.
    */
  private def lnSum(counts: Column): Column =
    aggregate(counts, lit(0).cast(DecimalType(38, 6)),
      (acc, c) => (acc +
        round(log(c.cast("double")), 6).cast(DecimalType(18, 6)) * c)
        .cast(DecimalType(38, 6)))

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_text_repetition",
      (s, dir) => {
        // Gopher-style repetition rules, token-bigram form: the fraction of
        // bigram instances claimed by the single most frequent bigram, the
        // fraction belonging to any repeated bigram, and the distinct-token
        // ratio. High repetition = low-quality generation/boilerplate.
        // ONE map pass, zero joins (r18, guide §2.4): the old form exploded
        // bigrams into a corpus-sized shuffle, aggregated twice by doc_id,
        // and joined back — all to compute PER-DOCUMENT quantities. The
        // bigram histogram is row-local ([[runCounts]] over the sorted
        // bigram array): top_n = max run, n_bigrams = array size, dup_n =
        // Σ runs ≥ 2. Identical integers, so the rounded ratios are the
        // same bit pattern; the only remaining distributed step is the
        // output sort the row contract requires.
        Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .select(col("doc_id"),
            size(col("t")).as("n_toks"),
            size(array_distinct(col("t"))).as("n_uniq"),
            array_sort(shingles(col("t"), 2)).as("bs"))
          .select(col("doc_id"), col("n_toks"), col("n_uniq"),
            size(col("bs")).cast("long").as("n_bigrams"),
            runCounts(col("bs")).as("cnts"))
          .select(
            col("doc_id"),
            r4(array_max(col("cnts")).cast("double") / col("n_bigrams"))
              .as("top_bigram_frac"),
            r4(aggregate(col("cnts"), lit(0L),
                (a, c) => a + when(c >= 2, c).otherwise(lit(0L)))
              .cast("double") / col("n_bigrams")).as("dup_bigram_frac"),
            r4(col("n_uniq").cast("double") / col("n_toks")).as("uniq_tok_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
            bg AS (SELECT doc_id, unnest($duckBigrams) AS b
                   FROM documents),
            c AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
            rep AS (SELECT doc_id, max(n) AS top_n, sum(n) AS n_bigrams,
                      sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_n
                    FROM c GROUP BY 1)
            SELECT d.doc_id,
              round(CAST(top_n AS DOUBLE) / n_bigrams, 4) AS top_bigram_frac,
              round(CAST(dup_n AS DOUBLE) / n_bigrams, 4) AS dup_bigram_frac,
              round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4)
                AS uniq_tok_ratio
            FROM d JOIN rep ON d.doc_id = rep.doc_id
            ORDER BY d.doc_id""")),

    GQuery(
      "q_text_entropy",
      (s, dir) => {
        // Token-distribution Shannon entropy per doc, via the algebraic
        // form H = ln(N) - (Σ n·ln n)/N. Each ln-term is rounded to 6
        // decimals and summed in exact decimal (see object scaladoc).
        // ONE map pass, zero shuffles except the output sort (r18, guide
        // §2.4): the token histogram each doc needs is row-local
        // ([[runCounts]] over the sorted token array) — the old explode +
        // two doc_id-keyed aggregations shuffled the corpus's full token
        // volume to compute a per-document quantity. Decimal accumulation
        // is exact, so the regrouped Σ is the identical value.
        Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .select(col("doc_id"),
            size(col("t")).cast("long").as("n_toks"),
            array_sort(col("t")).as("ts"))
          .select(
            col("doc_id"),
            col("n_toks"),
            r4(log(col("n_toks")) -
              lnSum(runCounts(col("ts"))).cast("double") / col("n_toks"))
              .as("entropy"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
            c AS (SELECT doc_id, tok, count(*) AS n FROM u GROUP BY 1, 2)
            SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks,
              round(ln(CAST(sum(n) AS DOUBLE)) -
                CAST(sum(CAST(round(ln(n), 6) AS DECIMAL(18,6)) * n) AS DOUBLE)
                  / sum(n), 4) AS entropy
            FROM c GROUP BY doc_id ORDER BY doc_id""")),

    GQuery(
      "q_corpus_decontam",
      (s, dir) => {
        // Benchmark decontamination: for each test-split doc, the fraction
        // of its distinct 5-gram shingles that also occur in any train-split
        // doc. The join shuffles on the shingle string — the standard
        // distributed decontamination shape (the train side is
        // corpus-sized; at 100 TB a Bloom filter over train shingles,
        // broadcast to the test side, prunes the exchange to near-misses
        // — same semantics, one fewer corpus-wide shuffle).
        val sh = Tables.documents(s, dir)
          .select(
            col("doc_id"), CorpusQueries.splitCol.as("split"),
            explode(array_distinct(shingles(tokens(col("text")), 5))).as("g"))
        val train = sh.filter(col("split") === "train")
          .select("g").distinct().withColumn("hit", lit(1))
        sh.filter(col("split") === "test")
          .join(train, Seq("g"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_grams"),
            sum(coalesce(col("hit"), lit(0))).as("n_overlap"))
          .select(
            col("doc_id"), col("n_grams"), col("n_overlap"),
            r4(col("n_overlap").cast("double") / col("n_grams"))
              .as("contam_rate"))
          .orderBy("doc_id")
      },
      Some(s"""WITH s AS (SELECT doc_id,
                ${CorpusQueries.duckSplit} AS split,
                unnest(list_distinct($duck5grams)) AS g
              FROM documents),
            tr AS (SELECT DISTINCT g FROM s WHERE split = 'train')
            SELECT doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                AS n_overlap,
              round(CAST(sum(CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
                / count(*), 4) AS contam_rate
            FROM s LEFT JOIN tr ON s.g = tr.g
            WHERE split = 'test'
            GROUP BY doc_id ORDER BY doc_id""")),

    GQuery(
      "q_text_boilerplate",
      (s, dir) => {
        // Shared-prefix boilerplate: groups of docs opening with the same
        // 2-token prefix (headers, templates, scraped nav bars). One
        // groupBy on the prefix — the classic "group by leading n-gram"
        // boilerplate sweep; prefix cardinality bounds the shuffle.
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            concat_ws(" ", slice(tokens(col("text")), 1, 2)).as("prefix"))
          .groupBy("prefix")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy("prefix")
      },
      Some(s"""SELECT array_to_string(($duckToks)[1:2], ' ') AS prefix,
              count(*) AS n_docs, min(doc_id) AS first_doc
            FROM documents GROUP BY 1 HAVING count(*) >= 2 ORDER BY prefix""")),

    GQuery(
      "q_corpus_datasheet",
      (s, dir) => {
        // The dataset-card rollup: per (lang, split), document count, token
        // volume, mean entropy, mean quality score, and how many docs carry
        // any repeated bigram — the summary table a training run's data
        // sheet reports. Means of rounded per-doc scores use the integer
        // micro-unit average (see q_lm_score) so the 4-decimal result is
        // the same bit pattern in any engine.
        //
        // ONE map pass, ZERO joins (r18, guide §2.4): the old form exploded
        // tokens AND bigrams into corpus-sized shuffles, re-aggregated each
        // by doc_id, and joined three per-doc frames back together — five
        // exchanges and two joins whose only purpose was to compute
        // PER-DOCUMENT quantities. Both are row-local over the token array:
        //   - entropy needs the token multiset's run-lengths — array_sort +
        //     boundary scan gives the same counts the (doc_id, tok) groupBy
        //     produced, and the Σ round(ln(n),6)·n accumulation is exact
        //     DECIMAL, so regrouping addition cannot change a digit;
        //   - has_dup ⟺ the bigram array has any duplicate ⟺
        //     size(b) > size(array_distinct(b)).
        // The only exchange left is the final (lang, split) rollup (partial
        // map-side agg). At 100 TB the win is the same: no token-volume
        // shuffle, no doc_id joins — one corpus pass. The repartition
        // spreads the (now genuinely CPU-heavy) row-local pass; no
        // checkpoint — the frame has a single consumer.
        graft.Spread.ifNarrow(Tables.documents(s, dir),
            s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("lang"), CorpusQueries.splitCol.as("split"),
            col("text"), tokens(col("text")).as("t"))
          .select(
            col("lang"), col("split"),
            size(col("t")).cast("long").as("nn"),
            round(qualityFromStats(tokenStats(col("text"))) * 1e4)
              .cast("long").as("q4"),
            array_sort(col("t")).as("ts"),
            shingles(col("t"), 2).as("bg"))
          .select(
            col("lang"), col("split"),
            col("nn").as("n_toks"),
            col("q4"),
            round((log(col("nn")) -
              lnSum(runCounts(col("ts"))).cast("double") / col("nn")) * 1e4)
              .cast("long").as("e4"),
            when(size(col("bg")) > size(array_distinct(col("bg"))), 1)
              .otherwise(0).as("has_dup"))
          .groupBy("lang", "split")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_toks").as("n_tokens"),
            sum("e4").as("se"), sum("q4").as("sq"),
            sum("has_dup").as("n_dup_docs"))
          .select(
            col("lang"), col("split"), col("n_docs"), col("n_tokens"),
            (expr("(2 * se + n_docs) DIV (2 * n_docs)").cast("double") / 10000)
              .as("avg_entropy"),
            (expr("(2 * sq + n_docs) DIV (2 * n_docs)").cast("double") / 10000)
              .as("avg_quality"),
            col("n_dup_docs"))
          .orderBy("lang", "split")
      },
      Some {
        val all = TextFunctions.stopwords.flatMap(_._2).distinct
          .map(w => s"'$w'").mkString(",")
        s"""WITH d AS (SELECT doc_id, lang, ${CorpusQueries.duckSplit} AS split,
                text, $duckToks AS toks FROM documents),
            base AS (SELECT doc_id, lang, split, len(toks) AS n_toks,
                CAST(round(greatest(0.0,
                  least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.5 +
                  least(CAST(len(list_filter(toks, t -> t IN ($all))) AS DOUBLE)
                    / len(toks) * 5.0, 1.0) * 0.5 -
                  coalesce(CAST(length(text) - length(regexp_replace(text,
                    '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                    / nullif(length(text), 0), 0.0)
                ) * 10000) AS BIGINT) AS q4
              FROM d),
            u AS (SELECT doc_id, unnest(toks) AS tok FROM d),
            c AS (SELECT doc_id, tok, count(*) AS n FROM u GROUP BY 1, 2),
            ent AS (SELECT doc_id, CAST(round((ln(CAST(sum(n) AS DOUBLE)) -
                CAST(sum(CAST(round(ln(n), 6) AS DECIMAL(18,6)) * n) AS DOUBLE)
                  / sum(n)) * 10000) AS BIGINT) AS e4
              FROM c GROUP BY doc_id),
            bg AS (SELECT doc_id, unnest($duckBigrams) AS b FROM documents),
            bc AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
            rep AS (SELECT doc_id, max(CASE WHEN n >= 2 THEN 1 ELSE 0 END)
                AS has_dup FROM bc GROUP BY 1),
            j AS (SELECT lang, split, count(*) AS n_docs,
                CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                CAST(sum(e4) AS BIGINT) AS se, CAST(sum(q4) AS BIGINT) AS sq,
                CAST(sum(has_dup) AS BIGINT) AS n_dup_docs
              FROM base JOIN ent USING (doc_id) JOIN rep USING (doc_id)
              GROUP BY 1, 2)
            SELECT lang, split, n_docs, n_tokens,
              CAST((2 * se + n_docs) // (2 * n_docs) AS DOUBLE) / 10000
                AS avg_entropy,
              CAST((2 * sq + n_docs) // (2 * n_docs) AS DOUBLE) / 10000
                AS avg_quality,
              n_dup_docs
            FROM j ORDER BY lang, split"""
      }),

    GQuery(
      "q_lm_score",
      (s, dir) => {
        // Unigram LM scoring: fit add-one-smoothed per-lang token
        // probabilities on the train split, score each val-split doc by
        // average negative log-likelihood — the classic perplexity-filter
        // stage of a training-data pipeline. The fitted model is
        // vocabulary-sized (not corpus-sized), so it broadcasts; scoring
        // is then one map-side join over the held-out docs, and only the
        // per-doc aggregation shuffles. Unseen tokens take the smoothing
        // floor 1/(N+V) via the left join's coalesce. A val doc whose lang
        // has NO train docs at all is unscorable — it stays in the output
        // (left join on totals) with a NULL avg_nll sentinel, identically
        // in both engines, rather than being silently dropped.
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            CorpusQueries.splitCol.as("split"), tokens(col("text")).as("t"))
        val trainTok = d.filter(col("split") === "train")
          .select(col("lang"), explode(col("t")).as("tok"))
        val counts = trainTok.groupBy("lang", "tok")
          .agg(count(lit(1)).as("c"))
        val totals = counts.groupBy("lang")
          .agg(sum("c").as("n_lang"), count(lit(1)).as("v_lang"))
        val valTok = d.filter(col("split") === "val")
          .select(col("doc_id"), col("lang"), explode(col("t")).as("tok"))
        // Terms in integer MICRO-NATS and the final 4-decimal half-up round
        // in pure integer arithmetic — round(decimal-exact / n, 4) lands on
        // exact midpoints (e.g. 60.5151/18 = 3.361950) where Spark
        // (exact-binary HALF_UP → down) and DuckDB (shortest-repr → up)
        // systematically disagree. floor((2s + 100n)/(200n)) is the same
        // integer everywhere. (log is 1-ulp engine-dependent; a term
        // landing within an ulp of a .5 micro-nat is measure-zero, unlike
        // the midpoint quotients, which this corpus actually produces.)
        val nllMicro = round(
          -log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
            (col("n_lang") + col("v_lang"))) * 1e6, 0).cast("long")
        valTok
          .join(broadcast(counts), Seq("lang", "tok"), "left")
          .join(broadcast(totals), Seq("lang"), "left")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_toks"), sum(nllMicro).as("s6"))
          .select(
            col("doc_id"), col("lang"), col("n_toks"),
            (expr("(2 * s6 + 100 * n_toks) DIV (200 * n_toks)")
              .cast("double") / 10000).as("avg_nll"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, lang,
                ${CorpusQueries.duckSplit} AS split, $duckToks AS t
              FROM documents),
            trn AS (SELECT lang, unnest(t) AS tok FROM d WHERE split = 'train'),
            counts AS (SELECT lang, tok, count(*) AS c FROM trn GROUP BY 1, 2),
            totals AS (SELECT lang, sum(c) AS n_lang, count(*) AS v_lang
                       FROM counts GROUP BY 1),
            vt AS (SELECT doc_id, lang, unnest(t) AS tok FROM d
                   WHERE split = 'val'),
            terms AS (SELECT vt.doc_id, vt.lang,
                CAST(round(-ln(
                  CAST(coalesce(c, 0) + 1 AS DOUBLE) / (n_lang + v_lang)
                ) * 1000000) AS BIGINT) AS t6
              FROM vt
              LEFT JOIN counts ON vt.lang = counts.lang AND vt.tok = counts.tok
              LEFT JOIN totals ON vt.lang = totals.lang)
            SELECT doc_id, lang, count(*) AS n_toks,
              CAST((2 * CAST(sum(t6) AS BIGINT) + 100 * count(*))
                   // (200 * count(*)) AS DOUBLE) / 10000 AS avg_nll
            FROM terms
            GROUP BY doc_id, lang ORDER BY doc_id"""))
  )
}
