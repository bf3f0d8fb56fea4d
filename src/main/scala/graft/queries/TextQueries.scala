package graft.queries

import graft.{Canon, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM training-data text pipeline (SURVEY.md §2.B-LLM): exact +
  * MinHash/SimHash/Jaccard dedup, tokenization/term-frequency, language-ID
  * and quality heuristics, document fingerprinting, token counting,
  * multimodal (binary column) plumbing.
  *
  * Everything is expression-level (higher-order functions over split
  * arrays), so per-document work is embarrassingly parallel, and the only
  * shuffles are the final group-bys / the candidate-pair joins. All hashes
  * are md5-derived so the DuckDB oracle recomputes them exactly.
  */
object TextQueries {
  import Canon._
  import TextFunctions._

  /** DuckDB-side tokenization matching TextFunctions.tokens. */
  private[queries] val duckToks = "string_split_regex(lower(trim(text)), '\\s+')"

  /** Near-duplicate pair generation via banded MinHash LSH, shared by
    * q_dedup_minhash_pairs and q_dedup_clusters: (a_id, b_id, est_jaccard)
    * for pairs whose matching-minhash fraction estimates jaccard ≥ 0.5.
    *
    * Banded LSH: 8-seed signature → 4 bands × 2 rows. Docs sharing any band
    * bucket become candidates (group-by-band join — the 100 TB near-dup
    * shape: bucket sizes, not corpus², bound the join), then pairs are
    * verified by the matching-minhash fraction, an unbiased Jaccard
    * estimate needing no second pass over the text.
    *
    * Plan staging (measured — these turned a 59 s query into <2 s at
    * sf0.1):
    *   - the signature projection is materialized ONCE (localCheckpoint —
    *     the single-node analog of writing the sig table out before the
    *     join): Catalyst does not CSE the 8 shingle+minhash subtrees
    *     across array elements, and a self-join would otherwise recompute
    *     that whole pipeline on both sides;
    *   - candidates are deduped on bare (a_id, b_id) — never shuffling the
    *     wide mh arrays — and the sig table is joined back only for the
    *     surviving pairs' estimates;
    *   - repartition first: a small local file is one input split, which
    *     would serialize the CPU-bound md5 signature projection onto one
    *     core (at warehouse scale the scan is already many splits and the
    *     round-robin spread is a cheap row-count-proportional shuffle);
    *   - the shingle array is staged in its own projection: the 8 seed
    *     expressions are higher-order functions (interpreted, no codegen
    *     subexpression elimination), so inlining `sh` into each array
    *     element would tokenize+shingle every document 8 times.
    *     CollapseProject keeps the stage because `sh` is non-cheap and
    *     consumed 8 times.
    */
  private[queries] def minhashPairs(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val sigs = minhashSigs(Tables.documents(s, dir)).localCheckpoint()
    sigPairs(sigs, sigs, self = true)
  }

  /** (doc_id, mh) signature frame: the native MinHashSig expression —
    * value-identical to the staged HOF pipeline (parity spec), one codegen'd
    * kernel per row. Callers materialize (localCheckpoint) before joining.
    */
  private[queries] def minhashSigs(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.Spread.ifNarrow(docs,
        docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), minhashSigFast(col("text"), 5, 8).as("mh"))

  /** 4-band × 2-row banding of a signature frame. */
  private def mhBanded(sigs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        concat_ws("|",
          element_at(col("mh"), b * 2 + 1),
          element_at(col("mh"), b * 2 + 2)))).as(Seq("band", "bsig")))

  /** est-verified candidate pairs between two (materialized) signature
    * frames: the banded bucket join, pair dedup on bare ids, then the
    * matching-minhash Jaccard estimate joined back from both sides.
    * `self = true` is the classic self-join over one frame (a_id < b_id
    * emits each pair once); `self = false` (the incremental-build
    * new-vs-seen dedup) treats the frames as disjoint id spaces and emits
    * every cross pair. An explicit parameter, not inferred from frame
    * identity — aliasing must never silently switch pair semantics.
    */
  private[queries] def sigPairs(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      self: Boolean): org.apache.spark.sql.DataFrame = {
    val a = mhBanded(left).toDF("a_id", "band", "bsig")
    val b = mhBanded(right).toDF("b_id", "band", "bsig")
    val cond = if (self) col("a_id") < col("b_id") else col("a_id") =!= col("b_id")
    val pairs = a.join(b, Seq("band", "bsig"))
      .filter(cond)
      .select("a_id", "b_id")
      .distinct() // a pair may collide in several bands — emit once
    pairs
      .join(left.select(col("doc_id").as("a_id"), col("mh").as("a_mh")), "a_id")
      .join(right.select(col("doc_id").as("b_id"), col("mh").as("b_mh")), "b_id")
      .withColumn("est", aggregate(
        zip_with(col("a_mh"), col("b_mh"),
          (p, q) => when(p === q, 1).otherwise(0)),
        lit(0), _ + _).cast("double") / 8.0)
      .filter(col("est") >= 0.5)
      .select(col("a_id"), col("b_id"), r4(col("est")).as("est_jaccard"))
  }

  /** DuckDB twin of [[minhashPairs]]: CTE bodies (no WITH keyword) named
    * sigs/banded/cand/mpairs; `mpairs` is (a_id, b_id, est_jaccard ≥ 0.5).
    */
  private[queries] val minhashPairsCtes: String = {
    val toks = duckToks
    val sh = s"""CASE WHEN len($toks) < 5 THEN [array_to_string($toks, ' ')]
              ELSE list_transform(range(1, len($toks) - 3),
                   i -> array_to_string($toks[i:i+4], ' ')) END"""
    val mh = (seed: Int) =>
      s"list_min(list_transform($sh, s -> md5($seed || ':' || s)))"
    s"""sigs AS (SELECT doc_id,
          [${(0 until 8).map(mh).mkString(", ")}] AS mh FROM documents),
        banded AS (SELECT doc_id, mh, band,
          mh[band * 2 + 1] || '|' || mh[band * 2 + 2] AS bsig
          FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS band)),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
          a.mh AS a_mh, b.mh AS b_mh
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
        mpairs AS (SELECT a_id, b_id,
          round(CAST(list_sum(list_transform(range(1, 9),
            i -> CASE WHEN a_mh[i] = b_mh[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / 8.0, 4) AS est_jaccard
          FROM cand
          WHERE CAST(list_sum(list_transform(range(1, 9),
            i -> CASE WHEN a_mh[i] = b_mh[i] THEN 1 ELSE 0 END))
            AS DOUBLE) / 8.0 >= 0.5)"""
  }

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_dedup_exact",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val deduped = d.dropDuplicates("lang", "text")
          .groupBy("lang").agg(count(lit(1)).as("n_unique"))
        d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .join(deduped, Seq("lang"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS n_unique
             FROM documents GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_dedup_minhash",
      (s, dir) => {
        // staged shingle projection — see q_dedup_minhash_pairs: the 9
        // consuming HOF expressions would otherwise each re-tokenize
        Tables.documents(s, dir)
          .select(col("doc_id"), shingles(tokens(col("text")), 5).as("sh"))
          .select(
            col("doc_id"),
            minhashSignature(col("sh"), 8).as("sig"),
            substring(minhash(col("sh"), 0), 1, 8).as("band0"))
          .orderBy("doc_id")
      },
      Some {
        val toks = duckToks
        val sh = s"""CASE WHEN len($toks) < 5 THEN [array_to_string($toks, ' ')]
                  ELSE list_transform(range(1, len($toks) - 3),
                       i -> array_to_string($toks[i:i+4], ' ')) END"""
        val mh = (seed: Int) =>
          s"list_min(list_transform($sh, s -> md5($seed || ':' || s)))"
        s"""SELECT doc_id,
           concat_ws('|', ${(0 until 8).map(mh).mkString(", ")}) AS sig,
           substring(${mh(0)}, 1, 8) AS band0
           FROM documents ORDER BY doc_id"""
      }),

    GQuery(
      "q_dedup_minhash_pairs",
      (s, dir) => minhashPairs(s, dir).orderBy("a_id", "b_id"),
      Some(s"""WITH $minhashPairsCtes
            SELECT a_id, b_id, est_jaccard FROM mpairs ORDER BY a_id, b_id""")),

    GQuery(
      "q_scale_cpu",
      (s, dir) => {
        // CORE-SCALING PROBE (VERDICT r18 item 2): a HIGH-RESOLUTION
        // 64-seed MinHash signature over every document, digested to a
        // bounded per-hex-bucket summary. Every other catalog row at bench
        // SF is fixed-overhead-bound (110 of 130 under 0.5 s; the driver's
        // 8↔32-core ratios all read ≈1 and `suspect_cpus_ignored` fired),
        // so the recorded bench could not demonstrate that ANY operator
        // parallelizes. This row is ~8 CPU-seconds of embarrassingly
        // parallel per-document signature arithmetic at sf0.1 — the cost
        // shape of real featurization — so the 8-vs-32-core bench pair
        // separates on it (~3×, measured).
        //
        // Pruning-proof by construction: the GROUP KEY derives from the
        // signature, so the bench's `count()` action cannot column-prune
        // the kernel away (it can and does prune pure output projections
        // elsewhere — guide §1.4). The signature is ONE native-kernel
        // expression (minhash_sig), so consuming 3 of its 64 elements
        // still computes all 64; the DuckDB oracle only recomputes the 3
        // the RESULT depends on — same values, exact hash match.
        // 160 seeds is the probe's resolution dial: the RESULT consumes
        // elements 1/32/64 only (so the oracle recomputes exactly those
        // three — k does not change a single output byte), while the
        // kernel's total arithmetic scales with k. 160 puts the row at
        // ~12 CPU-seconds at sf0.1 — far enough above the ~0.2 s job-
        // launch floor that the 8-vs-32-core ratio reads ~3×.
        val d = graft.Spread.ifNarrow(Tables.documents(s, dir),
          s.sparkContext.defaultParallelism * 2)
        d.select(minhashSigFast(col("text"), 5, 160).as("mh"))
          .groupBy(substring(element_at(col("mh"), 1), 1, 1).as("hd"))
          .agg(count(lit(1)).as("n"),
            min(element_at(col("mh"), 32)).as("min_h"),
            max(element_at(col("mh"), 64)).as("max_h"))
          .orderBy("hd")
      },
      Some {
        val toks = duckToks
        val sh = s"""CASE WHEN len($toks) < 5 THEN [array_to_string($toks, ' ')]
                  ELSE list_transform(range(1, len($toks) - 3),
                       i -> array_to_string($toks[i:i+4], ' ')) END"""
        val mh = (seed: Int) =>
          s"list_min(list_transform($sh, s -> md5($seed || ':' || s)))"
        s"""WITH sigs AS (SELECT ${mh(0)} AS h1, ${mh(31)} AS h32,
                ${mh(63)} AS h64 FROM documents)
            SELECT substring(h1, 1, 1) AS hd, count(*) AS n,
              min(h32) AS min_h, max(h64) AS max_h
            FROM sigs GROUP BY 1 ORDER BY 1"""
      }),

    GQuery(
      "q_dedup_simhash",
      (s, dir) => {
        // native kernel — value-identical to simhash(tokens(text), 16)
        // (SimHashSigSpec parity; the DuckDB oracle is the independent proof)
        Tables.documents(s, dir)
          .select(col("doc_id"), simhashFast(col("text"), 16).as("sh"))
          .orderBy("doc_id")
      },
      Some {
        val bit = (i: Int) =>
          s"""CASE WHEN list_sum(list_transform($duckToks, t ->
             (((strpos('0123456789abcdef', substring(md5(t), ${i / 4 + 1}, 1)) - 1)
               >> ${i % 4}) & 1) * 2 - 1)) >= 0
             THEN ${1L << i} ELSE 0 END"""
        s"""SELECT doc_id, CAST(${(0 until 16).map(bit).mkString(" + ")} AS BIGINT) AS sh
           FROM documents ORDER BY doc_id"""
      }),

    GQuery(
      "q_dedup_simhash_pairs",
      (s, dir) => {
        // Near-dup pairs BY the simhash (q_dedup_simhash computes it; this
        // query uses it): all (a, b) with Hamming(sh_a, sh_b) <= 3 over a
        // 32-bit signature. Blocking is the pigeonhole band trick — split
        // the signature into 4 byte-bands; <= 3 differing bits can touch at
        // most 3 bands, so every qualifying pair collides in at least one
        // band EXACTLY (zero false negatives, unlike probabilistic MinHash
        // banding). The self-join runs per (band, byte) bucket — at 100 TB
        // candidates are bounded by bucket sizes, never corpus²; the
        // DuckDB oracle is the NAIVE all-pairs form, so the hash gate
        // proves the banded plan equals the quadratic semantics it avoids.
        // Signatures are 32 md5-derived bit columns — materialized once
        // (localCheckpoint) for the two band sides + two verify joins.
        // The 8-byte signature RIDES the band rows (r19): the old form
        // deduped bare (a_id, b_id) candidates and joined the signature
        // table back TWICE to verify — two corpus-sized hash joins whose
        // only purpose was to re-attach one LONG per side. Verifying
        // INSIDE the band join (the signature is narrower than the row's
        // key columns, unlike the minhash family's 8×32-byte arrays, which
        // keep the dedup-on-bare-ids shape) kills both join-backs AND
        // shrinks the distinct's input from every band collision to the
        // true near-pairs. Same rows: hamming is a pure function of the
        // pair, so deduping (a_id, b_id, hamming) ≡ deduping (a_id, b_id).
        val sigs = graft.Spread.ifNarrow(Tables.documents(s, dir),
            s.sparkContext.defaultParallelism)
          .select(col("doc_id"), simhashFast(col("text"), 32).as("sh"))
          .localCheckpoint()
        val bands = sigs.select(col("doc_id"), col("sh"), posexplode(
          array((0 until 4).map(i =>
            shiftright(col("sh"), i * 8).bitwiseAND(lit(255L))): _*))
          .as(Seq("band", "bv")))
        bands.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
            col("band"), col("bv"))
          .join(bands.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
            col("band").as("b_band"), col("bv").as("b_bv")),
            col("band") === col("b_band") && col("bv") === col("b_bv") &&
              col("a_id") < col("b_id") &&
              hammingDistance(col("a_sh"), col("b_sh")) <= 3)
          .select(col("a_id"), col("b_id"),
            hammingDistance(col("a_sh"), col("b_sh")).cast("int").as("hamming"))
          .distinct()
          .orderBy("a_id", "b_id")
      },
      Some {
        val bit = (i: Int) =>
          s"""CASE WHEN list_sum(list_transform($duckToks, t ->
             (((strpos('0123456789abcdef', substring(md5(t), ${i / 4 + 1}, 1)) - 1)
               >> ${i % 4}) & 1) * 2 - 1)) >= 0
             THEN ${1L << i} ELSE 0 END"""
        s"""WITH s AS (SELECT doc_id,
              CAST(${(0 until 32).map(bit).mkString(" + ")} AS BIGINT) AS sh
            FROM documents)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
            ORDER BY a_id, b_id"""
      }),

    GQuery(
      "q_dedup_jaccard",
      (s, dir) => {
        // Unigram-set Jaccard over a deterministic sample; candidate pairs
        // restricted to same-lang (the blocking key).
        //
        // Hot-token guard = PREFIX FILTERING (the SSJoin/PPJoin lemma): a
        // naive exploded-token self-join is quadratic in each token's
        // document frequency, and one hot token blows the join up. Under a
        // global token order (df ascending, rarest first), jac(A,B) ≥ t
        // implies |A∩B| ≥ ⌈t·|A|⌉, so the first |X|−⌈t·|X|⌉+1 tokens of
        // each doc must already share a token — only that rare-token PREFIX
        // (~40% of each doc at t=0.6) enters the self-join, and the hottest
        // tokens never generate candidates from the long tail of docs where
        // they're non-prefix. Exact — zero false negatives, unlike a df
        // cutoff (which on this template corpus, vocab ≈ 31 tokens all in
        // ~80% of docs, would delete every token). Surviving candidates are
        // verified on the full token sets via array_intersect; at 100 TB
        // this is the Vernica et al. distributed set-similarity-join shape.
        // Both reused frames are materialized once (localCheckpoint — same
        // rationale as q_dedup_minhash_pairs): `d` feeds the prefix
        // derivation AND both verification joins, `pfx` feeds both sides of
        // the candidate self-join. Left lazy, Catalyst re-executes the whole
        // tokenize→explode→df-join→window subtree per consumer (~5× the
        // work; measured 34.5 s → ~6 s at sf0.1).
        // repartition before tokenizing (same rationale as minhash_pairs):
        // the sampled scan is one input split locally, which would run the
        // CPU-bound tokenize projection on a single core
        val d = graft.Spread.ifNarrow(
            Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
            s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("lang"),
            array_distinct(tokens(col("text"))).as("toks"))
          .localCheckpoint()
        // The prefix needs global token document-frequencies. Two plans,
        // gated on VOCABULARY SIZE (spark.graft.jaccard.maxKernelVocab,
        // default 10^6):
        //   - small vocab: collect dfs to the driver and ship it into the
        //     TokenPrefix kernel as a plan constant (the VectorIndex
        //     centroid pattern) — deletes the whole explode →
        //     broadcast-join → double-window stage; the token stream never
        //     shuffles or sorts per doc at all (TokenPrefixSpec pins
        //     bit-for-bit parity with the window form).
        //   - large vocab: Heaps-law vocab on web-scale text (typos, ids,
        //     code tokens) reaches 10^8–10^9 distinct tokens — a driver OOM
        //     and multi-GB task closure if collected. Fall back to the
        //     distributed form: explode → df join → row_number/count
        //     windows → prefix filter. Same rows, no driver bound.
        // take(cap+1) resolves the gate and fetches the map in ONE job with
        // bounded driver memory: cap+1 rows back means "too big", never more.
        val vocabCap = math.min(
          s.conf.get("spark.graft.jaccard.maxKernelVocab", "1000000").toLong,
          Int.MaxValue - 1L)
        val dfs = d.select(explode(col("toks")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("df"))
        val vocabHead = dfs.take(vocabCap.toInt + 1)
        val pfx = if (vocabHead.length <= vocabCap) {
          val dfsMap = vocabHead
            .map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
          // no checkpoint for pfx: it is a row-local kernel projection over
          // the already-checkpointed d, so recomputing it on each self-join
          // side is cheaper than materializing it (the old window form
          // re-ran a shuffle+sort per consumer — THAT needed it)
          // posexplode: `pos` is the token's 0-based rank in the doc's
          // global (df, token) order — TokenPrefix emits the prefix in
          // exactly that order — feeding the positional filter below
          d.select(col("doc_id"), col("lang"),
              size(col("toks")).cast("long").as("sz"),
              posexplode(tokenPrefix(col("toks"), dfsMap, 0.6))
                .as(Seq("pos", "token")))
            .select("doc_id", "lang", "token", "sz", "pos")
        } else {
          val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          d.select(col("doc_id"), col("lang"), explode(col("toks")).as("token"))
            .join(dfs, "token")
            .withColumn("pos", row_number().over(wDoc.orderBy("df", "token")))
            .withColumn("sz", count(lit(1)).over(wDoc))
            .filter(col("pos") <= col("sz") - ceil(col("sz") * 0.6) + 1)
            // 0-based like the kernel path's posexplode
            .select(col("doc_id"), col("lang"), col("token"), col("sz"),
              (col("pos") - 1).as("pos"))
            // materialize: both self-join sides reuse it, and unlike the
            // kernel form this subtree carries a shuffle+sort per consumer
            .localCheckpoint()
        }
        // LENGTH FILTER (the SSJoin companion lemma): jac(A,B) ≥ t forces
        // t·|A| ≤ |B| ≤ |A|/t, so size-mismatched docs sharing a prefix
        // token never become candidates — carried on the prefix rows, it
        // prunes inside the join before the distinct shuffle sees the pair.
        // POSITIONAL FILTER (PPJoin, r19): a shared token at 0-based rank
        // p bounds the overlap at |X| − p (every common token sits at rank
        // ≥ p of the doc whose first common token it is), and jac ≥ t
        // needs o ≥ ⌈t/(1+t)·(|A|+|B|)⌉ = ⌈0.375·(a+b)⌉ (exact: 0.375 and
        // its integer multiples are representable doubles). Zero false
        // negatives: a true pair's FIRST common token is inside both
        // prefixes (the prefix lemma) and passes this bound by
        // construction, so the pair always reaches the distinct — the
        // filter only deletes collision occurrences that cannot anymore
        // reach the overlap the threshold demands.
        val cand = pfx.select(col("doc_id").as("a_id"), col("lang"),
            col("token"), col("sz").as("a_sz"), col("pos").as("a_pos"))
          .join(pfx.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
            col("token").as("b_token"), col("sz").as("b_sz"),
            col("pos").as("b_pos")),
            col("token") === col("b_token") && col("lang") === col("b_lang") &&
              col("a_id") < col("b_id") &&
              col("b_sz") >= ceil(col("a_sz") * 0.6) &&
              col("a_sz") >= ceil(col("b_sz") * 0.6) &&
              least(col("a_sz") - col("a_pos"), col("b_sz") - col("b_pos")) >=
                ceil((col("a_sz") + col("b_sz")) * 0.375))
          .select("a_id", "b_id")
          .distinct()
        cand
          .join(d.select(col("doc_id").as("a_id"), col("toks").as("a_toks")), "a_id")
          .join(d.select(col("doc_id").as("b_id"), col("toks").as("b_toks")), "b_id")
          .withColumn("shared", size(array_intersect(col("a_toks"), col("b_toks"))))
          .withColumn("jac", col("shared").cast("double") /
            (size(col("a_toks")) + size(col("b_toks")) - col("shared")))
          .filter(col("jac") >= 0.6)
          .select(col("a_id"), col("b_id"), r4(col("jac")).as("jaccard"))
          .orderBy("a_id", "b_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, lang,
                list_distinct($duckToks) AS toks
                FROM documents WHERE doc_id % 5 = 0),
              t AS (SELECT doc_id, lang, unnest(toks) AS token FROM d),
              dfs AS (SELECT token, count(*) AS df FROM t GROUP BY 1),
              ord AS (SELECT t.doc_id, t.lang, t.token,
                  row_number() OVER (PARTITION BY t.doc_id ORDER BY dfs.df, t.token) AS pos,
                  count(*) OVER (PARTITION BY t.doc_id) AS sz
                FROM t JOIN dfs USING (token)),
              pfx AS (SELECT doc_id, lang, token FROM ord
                WHERE pos <= sz - ceil(0.6 * sz) + 1),
              cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM pfx a JOIN pfx b ON a.token = b.token AND a.lang = b.lang
                  AND a.doc_id < b.doc_id),
              scored AS (SELECT a_id, b_id,
                  len(list_intersect(da.toks, db.toks)) AS shared,
                  len(da.toks) AS a_sz, len(db.toks) AS b_sz
                FROM cand
                JOIN d da ON da.doc_id = a_id
                JOIN d db ON db.doc_id = b_id)
              SELECT a_id, b_id,
                round(CAST(shared AS DOUBLE) / (a_sz + b_sz - shared), 4) AS jaccard
              FROM scored
              WHERE CAST(shared AS DOUBLE) / (a_sz + b_sz - shared) >= 0.6
              ORDER BY a_id, b_id""")),

    GQuery(
      "q_text_tokens",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("token"))
          .limit(20)
      },
      Some(s"""SELECT token, count(*) AS doc_count FROM (
                SELECT doc_id, unnest(list_distinct($duckToks)) AS token
                FROM documents)
              GROUP BY 1 ORDER BY doc_count DESC, token LIMIT 20""")),

    GQuery(
      "q_text_stats",
      (s, dir) => {
        Tables.documents(s, dir)
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            r4(davg(col("n_chars"))).as("avg_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("lang", "source")
      },
      Some(s"""SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              round(${sql.davg("n_chars")}, 4) AS avg_chars,
              min(n_chars) AS min_chars, max(n_chars) AS max_chars
              FROM documents GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_text_langid",
      (s, dir) => {
        // Stepwise projection: tokenize once, score each language as its own
        // column, argmax via when-chain. The one-expression langId() reduce
        // would re-inline the tokenizer 2^|langs| times (CollapseProject
        // can't CSE across struct field accesses of higher-order functions).
        val scored = Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
          .select(col("doc_id") +: stopwords.map { case (l, ws) =>
            stopwordHits(col("toks"), ws).as(s"s_$l")
          }: _*)
        val m = greatest(stopwords.map(l => col(s"s_${l._1}")): _*)
        val detected = stopwords.foldLeft(when(m === 0, lit("und"))) {
          case (acc, (l, _)) => acc.when(col(s"s_$l") === m, lit(l))
        }
        scored
          .select(detected.as("detected"))
          .groupBy("detected").agg(count(lit(1)).as("n"))
          .orderBy("detected")
      },
      Some {
        val score = (words: Seq[String]) =>
          s"len(list_filter($duckToks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
        val scores = TextFunctions.stopwords.map { case (l, ws) => l -> score(ws) }
        val m = s"greatest(${scores.map(_._2).mkString(", ")})"
        val pick = scores
          .map { case (l, sc) => s"WHEN $sc = m THEN '$l'" }
          .mkString(" ")
        s"""WITH d AS (SELECT doc_id, $m AS m,
           ${scores.map { case (l, sc) => s"$sc AS s_$l" }.mkString(", ")}
           FROM documents)
           SELECT detected, count(*) AS n FROM (
             SELECT CASE WHEN m = 0 THEN 'und'
               ${TextFunctions.stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")}
               END AS detected FROM d)
           GROUP BY 1 ORDER BY 1"""
      }),

    GQuery(
      "q_text_quality",
      (s, dir) => {
        // one native kernel pass (TokenStats) staged as a struct, ratios
        // derived from its fields — replaces 4 interpreted HOF sweeps +
        // a regex rewrite per row; values bit-identical (TokenStatsSpec)
        Tables.documents(s, dir)
          .select(col("doc_id"), tokenStats(col("text")).as("ts"))
          .select(
            col("doc_id"),
            col("ts.n_tokens").as("n_tokens"),
            r4(col("ts.sum_tok_len").cast("double") / col("ts.n_tokens"))
              .as("mean_tok_len"),
            r4(col("ts.sw_hits").cast("double") / col("ts.n_tokens"))
              .as("sw_ratio"),
            r4(col("ts.non_alnum").cast("double") / nullif(col("ts.text_len"), lit(0)))
              .as("nonalnum_ratio"),
            r4(qualityFromStats(col("ts"))).as("quality"))
          .orderBy("doc_id")
      },
      Some {
        val all = TextFunctions.stopwords.flatMap(_._2).distinct
          .map(w => s"'$w'").mkString(",")
        s"""WITH d AS (SELECT doc_id, text, $duckToks AS toks FROM documents),
           q AS (SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
               AS mean_tok_len,
             CAST(len(list_filter(toks, t -> t IN ($all))) AS DOUBLE) / len(toks)
               AS sw_ratio,
             CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
               AS DOUBLE) / length(text) AS nonalnum_ratio
           FROM d)
           SELECT doc_id, n_tokens, round(mean_tok_len, 4) AS mean_tok_len,
             round(sw_ratio, 4) AS sw_ratio,
             round(nonalnum_ratio, 4) AS nonalnum_ratio,
             round(greatest(0.0,
               least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 +
               least(sw_ratio * 5.0, 1.0) * 0.5 -
               coalesce(nonalnum_ratio, 0.0)), 4) AS quality
           FROM q ORDER BY doc_id"""
      }),

    GQuery(
      "q_text_phrase",
      (s, dir) => {
        // PHRASE SEARCH (positional adjacency): documents containing the
        // exact 2-gram "merge sort", with occurrence counts — the IR verb
        // a bag-of-words index cannot answer (BM25 scores the two terms
        // anywhere in the doc; a phrase demands CONSECUTIVE positions).
        // Shape: posexplode gives every token its position, each side
        // filters to ITS term BEFORE anything joins — so the equi-join on
        // (doc_id, position+1 = position) is term-frequency-sized, never
        // corpus-token-sized, and there is no window, no cartesian, no
        // per-doc state. At 100 TB this is the standard positional-
        // postings intersection, expressed as a plain co-partitioned
        // equi-join Catalyst can shuffle on the composite key.
        val tok = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode(tokens(col("text"))).as(Seq("pos", "token")))
        // ONE corpus pass: filter to the phrase's terms first, pin the
        // term-frequency-sized survivors, and let both position sides
        // read the pinned frame — referencing the raw token stream twice
        // would scan the 100 TB text column twice
        val hits = tok.filter(col("token").isin("merge", "sort"))
          .localCheckpoint()
        val first = hits.filter(col("token") === "merge")
          .select(col("doc_id"), (col("pos") + 1).as("nxt"))
        val second = hits.filter(col("token") === "sort")
          .select(col("doc_id"), col("pos").as("nxt"))
        first.join(second, Seq("doc_id", "nxt"))
          .groupBy("doc_id").agg(count(lit(1)).as("hits"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, hits FROM (
               SELECT doc_id,
                 len(list_filter(generate_series(1, len(t) - 1),
                   i -> t[i] = 'merge' AND t[i+1] = 'sort')) AS hits
               FROM (SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\s+') AS t
                     FROM documents))
             WHERE hits > 0 ORDER BY doc_id""")),

    GQuery(
      "q_text_fingerprint",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, lower(trim(text)) AS t FROM documents)
             SELECT doc_id,
               list_min(list_transform(
                 list_transform(range(1, greatest((length(t) - 4) // 4, 1) + 1),
                   i -> substring(t, (i - 1) * 4 + 1, 8)),
                 g -> md5(g))) AS fp
             FROM d ORDER BY doc_id""")),

    GQuery(
      "q_token_count",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            nTokens(col("text")).as("ws_tokens"),
            regexTokenCount(col("text")).as("re_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              len($duckToks) AS ws_tokens,
              len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                AS re_tokens
              FROM documents ORDER BY doc_id""")),

    GQuery(
      "q_token_bpe",
      (s, dir) => {
        // SUBWORD (BPE) token counting — the unit real training-data
        // budgets are denominated in; whitespace counts diverge from it
        // systematically (code, rare words, agglutination), which is why
        // q_token_count alone misprices a curriculum. The FROZEN merge
        // table (graft.functions.BpeTokenizer.Merges — trained once on
        // the fixture corpus, the production frozen-tokenizer shape) is
        // applied as a literal replace chain, provably ≡ the reference
        // Sennrich encoder (BpeTokenizerSpec, full-vocabulary pin). Scale
        // shape: the chain runs over DISTINCT words (vocabulary-sized)
        // and hash-joins back to the exploded corpus — per-doc work is
        // embarrassingly parallel, the only shuffles are the distinct
        // and the final group-by. ORACLE-EXACT: the DuckDB side replays
        // the SAME generated replace chain (BpeTokenizer.bpeCountSql),
        // byte-for-byte, rather than trusting the Spark encode.
        import graft.functions.BpeTokenizer
        // per-doc word multiplicities are ROW-LOCAL (r18, guide §2.4 —
        // the q_rank_bm25 shape): explode (word, n) runs instead of every
        // word instance, so the vocab distinct, the hash-join back, and
        // the per-doc aggregation all move DISTINCT pairs; ws_tokens =
        // size(t) rides the pair frame and Σ n·n_bpe_w reproduces the
        // instance sum exactly (integers)
        val d = graft.Spread.ifNarrow(Tables.documents(s, dir),
            math.max(8, s.sparkContext.defaultParallelism / 4))
          .select(col("doc_id"), array_sort(tokens(col("text"))).as("ts"))
          .localCheckpoint() // feeds the vocab distinct AND the scoring join
        val pairs = d.select(col("doc_id"),
            size(col("ts")).cast("long").as("ws_tokens"),
            explode(TextFunctions.runs(col("ts"))).as("r"))
          .select(col("doc_id"), col("ws_tokens"),
            col("r.v").as("word"), col("r.n").as("n"))
        val vocab = pairs.select("word").distinct()
          .withColumn("n_bpe_w", BpeTokenizer.bpeCountCol(col("word")))
        pairs.join(vocab, "word")
          .groupBy("doc_id")
          .agg(max("ws_tokens").as("ws_tokens"),
            sum(col("n") * col("n_bpe_w")).cast("long").as("bpe_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (
                SELECT doc_id, unnest($duckToks) AS word FROM documents),
              v AS (
                SELECT word,
                  ${graft.functions.BpeTokenizer.bpeCountSql("word")} AS n_bpe_w
                FROM (SELECT DISTINCT word FROM w))
              SELECT w.doc_id,
                count(*) AS ws_tokens,
                CAST(sum(v.n_bpe_w) AS BIGINT) AS bpe_tokens
              FROM w JOIN v USING (word)
              GROUP BY w.doc_id ORDER BY w.doc_id""")),

    GQuery(
      "q_text_pii",
      (s, dir) => {
        // PII detection + redaction — the scrubbing stage every training-
        // data pipeline runs before release. The corpus is synthetic word
        // soup, so deterministic PII (an email, an IP, every third doc a
        // phone) is spliced in from doc_id identically on both engines; the
        // regexes then count and redact it. Patterns are deliberately in the
        // Java-regex ∩ RE2 common subset (\b, \d, classes, bounded repeats)
        // so Spark and DuckDB scan them identically; the md5 of the redacted
        // text proves byte-identical redaction, not just equal counts.
        // Embarrassingly parallel — one narrow projection until the sort.
        val aug = concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" host 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" tel 555-"),
              lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
              lit("-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
        val redacted = regexp_replace(
          regexp_replace(
            regexp_replace(aug, emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          ipRe, "<IP>")
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            regexp_count(aug, lit(emailRe)).as("n_email"),
            regexp_count(aug, lit(ipRe)).as("n_ip"),
            regexp_count(aug, lit(phoneRe)).as("n_phone"),
            md5(redacted).as("red_hash"))
          .orderBy("doc_id")
      },
      Some {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
        s"""WITH a AS (SELECT doc_id,
              text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                   || CASE WHEN doc_id % 3 = 0
                        THEN ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                             || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS aug
              FROM documents)
            SELECT doc_id,
              len(regexp_extract_all(aug, '$emailRe')) AS n_email,
              len(regexp_extract_all(aug, '$ipRe')) AS n_ip,
              len(regexp_extract_all(aug, '$phoneRe')) AS n_phone,
              md5(regexp_replace(regexp_replace(regexp_replace(aug,
                '$emailRe', '<EMAIL>', 'g'),
                '$phoneRe', '<PHONE>', 'g'),
                '$ipRe', '<IP>', 'g')) AS red_hash
            FROM a ORDER BY doc_id"""
      }),

    GQuery(
      "q_mm_meta",
      (s, dir) => {
        // Multimodal plumbing: an opaque binary column + typed metadata
        // derived by a (stubbed) decode — deterministic fake per the brief;
        // the schema/partitioning/batching shape is real.
        val bin = encode(col("text"), "UTF-8")
        val nBytes = length(bin)
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            nBytes.as("n_bytes"),
            (lit(320) + pmod(nBytes, lit(320))).as("width"),
            (lit(240) + pmod(nBytes, lit(240))).as("height"),
            element_at(array(lit("jpeg"), lit("png"), lit("webp")),
              (pmod(nBytes, lit(3)) + 1).cast("int")).as("format"),
            size(sequence(lit(0), least(pmod(nBytes, lit(10)), lit(5)))).as("n_frames"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
             CAST(240 + octet_length(encode(text)) % 240 AS INT) AS height,
             (['jpeg','png','webp'])[octet_length(encode(text)) % 3 + 1] AS format,
             CAST(least(octet_length(encode(text)) % 10, 5) + 1 AS INT) AS n_frames
             FROM documents ORDER BY doc_id""")),

    GQuery(
      "q_rank_bm25",
      (s, dir) => {
        // Okapi BM25 ranking (k1 = 1.2, b = 0.75) — the lexical-retrieval
        // standard whose tf-saturation + doc-length normalization the RRF
        // hybrid's plain idf sum only approximates. Structure is the
        // inverted-index candidate join of q_hybrid_rrf: query terms meet
        // the (doc, token) postings, guarded by a deterministic stop-word
        // cap (df·10 > 9·n_docs — drop tokens in >90 % of docs) that
        // bounds posting-list joins at 100 TB; the cap is looser than the
        // hybrid row's df·2 rule because BM25's idf already down-weights
        // common terms smoothly and this corpus's vocabulary is nearly
        // ubiquitous by construction. Per
        // (query, term, doc) the score is a FIXED double expression tree
        // over integer inputs (tf, df, dl, n_docs) — every +,·,/ IEEE-
        // correctly-rounded, so both engines produce bit-identical doubles
        // — rounded to 6 and summed in EXACT DECIMAL so cross-engine sum
        // order can't flip a rank (the q_hybrid_rrf contract). idf is the
        // Robertson/Lucene ln(1 + (N−df+0.5)/(df+0.5)) form, which never
        // goes negative. Top-10 docs per query, ties on doc_id.
        // repartition before tokenizing (the minhash_pairs rationale): the
        // local scan is one split, which would run the CPU-bound tokenize
        // on a single core. CAPPED at 8: the checkpoint has several
        // concurrent consumers whose jobs launch together, so partitions
        // multiply across jobs and a full-width spread measured
        // task-overhead-bound; the count stays cluster-proportional.
        //
        // Per-doc tf and dl are ROW-LOCAL (r18, guide §2.4): the
        // (doc_id, token) groupBy shuffled the corpus's full token volume
        // and the dl groupBy + join shuffled it again, all to compute
        // per-document counts — TextFunctions.runs over the sorted token
        // array yields the identical (token, tf) integers with zero
        // exchanges, and dl = size(ts) rides the tf frame so the dl join
        // disappears. What stays distributed is exactly what is global:
        // the df/idf aggregation (one exchange over DISTINCT (doc, token)
        // pairs — strictly fewer bytes than the old token-instance
        // shuffle), the query⨝postings join, and the top-k window.
        val d = graft.Spread.ifNarrow(Tables.documents(s, dir),
            math.max(8, s.sparkContext.defaultParallelism / 4))
          .select(col("doc_id"), array_sort(tokens(col("text"))).as("ts"))
          .localCheckpoint() // feeds tf/dl, df AND the query side
        val stats = d.agg(count(lit(1)).as("n_docs"),
          (sum(size(col("ts"))).cast("double") / count(lit(1))).as("avgdl"))
        val tf = d.select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
            explode(TextFunctions.runs(col("ts"))).as("r"))
          .select(col("doc_id"), col("dl"),
            col("r.v").as("token"), col("r.n").as("tf"))
        val idf = tf.groupBy("token").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(stats))
          .filter(InvertedIndex.underStopCap(col("df"), col("n_docs")))
          .withColumn("idf", InvertedIndex.idfOf(col("n_docs"), col("df")))
          .select("token", "idf", "avgdl")
        val qTok = d.filter(col("doc_id") < 3)
          .select(col("doc_id").as("q_id"),
            explode(array_distinct(col("ts"))).as("token"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("bm25").desc, col("doc_id").asc)
        qTok.join(tf, "token")
          .filter(col("doc_id") =!= col("q_id"))
          .join(idf, "token")
          .withColumn("term_score", InvertedIndex.termScore(
            col("tf"), col("dl"), col("idf"), col("avgdl")))
          .groupBy("q_id", "doc_id").agg(sum("term_score").as("bm25"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("rnk"), col("doc_id"),
            round(col("bm25").cast("double"), 4).as("bm25"))
          .orderBy("q_id", "rnk")
      },
      Some(s"""WITH tok AS (
                SELECT doc_id, unnest($duckToks) AS token FROM documents),
              dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
              stats AS (SELECT count(*) AS n_docs,
                CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
              tf AS (SELECT doc_id, token, count(*) AS tf
                FROM tok GROUP BY doc_id, token),
              idf AS (
                SELECT token, round(ln(
                  (CAST((SELECT n_docs FROM stats) AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) AS idf
                FROM (SELECT token, count(*) AS df FROM tf GROUP BY token)
                WHERE df * 10 <= (SELECT n_docs FROM stats) * 9),
              q AS (SELECT DISTINCT doc_id AS q_id, token FROM tok WHERE doc_id < 3),
              scored AS (
                SELECT q.q_id, t.doc_id,
                  sum(CAST(round(i.idf * ((CAST(t.tf AS DOUBLE) * 2.2) /
                    (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 +
                      (0.75 * CAST(d.dl AS DOUBLE)) /
                        (SELECT avgdl FROM stats)))), 6) AS DECIMAL(18,6))) AS bm25
                FROM q JOIN tf t USING (token)
                JOIN idf i USING (token)
                JOIN dl d ON d.doc_id = t.doc_id
                WHERE t.doc_id <> q.q_id
                GROUP BY q.q_id, t.doc_id),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY bm25 DESC, doc_id ASC) AS rnk
                FROM scored)
              SELECT q_id, rnk, doc_id, round(CAST(bm25 AS DOUBLE), 4) AS bm25
              FROM ranked WHERE rnk <= 10 ORDER BY q_id, rnk""")),

    GQuery(
      "q_rank_bm25_idx",
      (s, dir) => {
        // The SAME BM25 ranking served from the PERSISTED inverted index
        // (InvertedIndex: token-bucket-partitioned postings, planning-time
        // bucket pruning, committed-epoch reads) — the search-engine
        // serving path beside q_rank_bm25's direct computation, sharing
        // its scoring expressions so the result is oracle-exact against
        // the identical SQL. The physical payoffs (numFiles pruning,
        // delta ≡ rebuild, crashed-append invisibility) are proven in
        // InvertedIndexSpec; THIS row gates the end-to-end build→serve
        // flow against the oracle.
        val docs = Tables.documents(s, dir)
        if (docs.limit(1).isEmpty)
          // zero-row contract (EmptyInputSpec): nothing to index
          spark_empty_bm25(s)
        else {
          val d = java.nio.file.Files.createTempDirectory("graft_invidx").toString
          try {
            InvertedIndex.build(s, docs, d)
            val queries = docs.filter(col("doc_id") < 3)
              .select(col("doc_id").as("q_id"), col("text"))
            InvertedIndex.bm25TopK(s, d, queries, k = 10,
              excludeQueryDoc = true).localCheckpoint()
          } finally org.apache.commons.io.FileUtils
            .deleteQuietly(new java.io.File(d))
        }
      },
      Some(s"""WITH tok AS (
                SELECT doc_id, unnest($duckToks) AS token FROM documents),
              dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
              stats AS (SELECT count(*) AS n_docs,
                CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
              tf AS (SELECT doc_id, token, count(*) AS tf
                FROM tok GROUP BY doc_id, token),
              idf AS (
                SELECT token, round(ln(
                  (CAST((SELECT n_docs FROM stats) AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) AS idf
                FROM (SELECT token, count(*) AS df FROM tf GROUP BY token)
                WHERE df * 10 <= (SELECT n_docs FROM stats) * 9),
              q AS (SELECT DISTINCT doc_id AS q_id, token FROM tok WHERE doc_id < 3),
              scored AS (
                SELECT q.q_id, t.doc_id,
                  sum(CAST(round(i.idf * ((CAST(t.tf AS DOUBLE) * 2.2) /
                    (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 +
                      (0.75 * CAST(d.dl AS DOUBLE)) /
                        (SELECT avgdl FROM stats)))), 6) AS DECIMAL(18,6))) AS bm25
                FROM q JOIN tf t USING (token)
                JOIN idf i USING (token)
                JOIN dl d ON d.doc_id = t.doc_id
                WHERE t.doc_id <> q.q_id
                GROUP BY q.q_id, t.doc_id),
              ranked AS (SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY bm25 DESC, doc_id ASC) AS rnk
                FROM scored)
              SELECT q_id, rnk, doc_id, round(CAST(bm25 AS DOUBLE), 4) AS bm25
              FROM ranked WHERE rnk <= 10 ORDER BY q_id, rnk"""),
      // the build is fixture-bound fs work (like the other index rows):
      // correctness-gated, excluded from the timed catalog
      bench = false))

  /** The zero-row (q_id, rnk, doc_id, bm25) frame. */
  private def spark_empty_bm25(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Int, Long, Double)].toDF("q_id", "rnk", "doc_id", "bm25")
  }
}
