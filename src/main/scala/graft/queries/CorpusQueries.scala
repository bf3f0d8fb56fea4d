package graft.queries

import graft.{Canon, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-management operators a training-data pipeline needs beyond
  * per-document scoring: deterministic dataset splits, TF-IDF term
  * weighting, and near-duplicate cluster assembly (the step after pair
  * generation — pick one survivor per duplicate group).
  *
  * Reference analog: none (the reference syncs single records); these are
  * the batch corpus ops of SURVEY.md's LLM-pipeline section, built to the
  * same determinism contract as the rest of the catalog (md5-derived
  * hashing, exact tie-breaks, total-order output).
  */
object CorpusQueries {
  import Canon._
  import TextFunctions._

  /** Nibble i (1-based) of an md5 hex string as 0..15 — the md5-derived
    * "random but reproducible anywhere" value used for split assignment.
    * SQL instr form so the DuckDB twin (strpos) is character-identical.
    */
  private def nib(h: Column, i: Int): Column =
    call_function("instr", lit("0123456789abcdef"), substring(h, i, 1)) - 1

  /** The deterministic split assignment (see q_sample_stratified) as a
    * reusable Column, and its character-identical DuckDB twin.
    */
  private[queries] def splitCol: Column = {
    val h = md5(col("doc_id").cast("string"))
    val bucket = pmod(nib(h, 1) * 16 + nib(h, 2), lit(100))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  private[queries] val duckBucket =
    """((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
       + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 100"""

  private[queries] val duckSplit =
    s"""CASE WHEN $duckBucket < 80 THEN 'train'
         WHEN $duckBucket < 90 THEN 'val'
         ELSE 'test' END"""

  /** Default chunking block: 2^18 consecutive doc_ids per window partition.
    * At ~10^10 docs (a 100 TB corpus) that is ~40k GLOBAL blocks; the
    * offsets table is one row per (key, block) — with interleaved keys that
    * can reach keys×blocks rows (~10^6-10^7 at the design point), which is
    * why the offsets join carries NO broadcast hint: AQE broadcasts it
    * when it is actually small and shuffle-joins otherwise. Each window
    * partition stays bounded by the block, not by a key's share of the
    * corpus.
    */
  val ChunkBlockSize: Long = 1L << 18

  /** Exclusive running sum of `n_tokens` ordered by `doc_id` within each
    * `keys` group, as a two-phase (blocked) prefix sum — the scale-safe
    * form of `sum(n_tokens) OVER (PARTITION BY keys ORDER BY doc_id ROWS
    * UNBOUNDED PRECEDING .. 1 PRECEDING)`.
    *
    * A single window partitioned only by `lang` puts an entire language on
    * one task — at 100 TB a hot language is a multi-TB window partition.
    * Instead: bucket rows by `doc_id DIV blockSize` (deterministic integer
    * arithmetic — blocks are contiguous doc_id ranges, so (keys, _blk asc,
    * doc_id asc) is the same total order; no range-partitioner sampling,
    * no pinned partitioning needed), then
    *
    *   phase 1 — ONE shuffle on (keys, _blk): per-block local exclusive
    *     cumsum plus the block's total, both from the same WindowExec
    *     partitioning; materialized (localCheckpoint) so the expensive
    *     upstream (tokenize at 100 TB) runs once;
    *   phase 2 — reduce to one row per (keys, _blk) [tiny: #keys × #blocks],
    *     exclusive-prefix those totals per key (a window over the tiny
    *     frame), broadcast-join the offsets back: tokens_before =
    *     local_before + block_offset.
    *
    * Row-identical to the single-window form (CorpusQueriesSpec proves it
    * on a one-language skew fixture where this plan uses many window
    * partitions and the naive plan uses one).
    *
    * `docs` must carry `doc_id` (integral), the `keys` columns, and
    * `n_tokens`; adds `tokens_before`.
    */
  private[queries] def withTokensBefore(
      docs: DataFrame, keys: Seq[String],
      blockSize: Long = ChunkBlockSize): DataFrame = {
    val grpBlk = (keys :+ "_blk").map(col)
    val localW = Window.partitionBy(grpBlk: _*).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = docs
      .withColumn("_blk", expr(s"doc_id DIV $blockSize"))
      .withColumn("_local_before",
        coalesce(sum("n_tokens").over(localW), lit(0L)))
      .localCheckpoint()
    val offW = Window.partitionBy(keys.map(col): _*).orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = staged
      .groupBy(grpBlk: _*).agg(sum("n_tokens").as("_t"))
      .withColumn("_blk_before", coalesce(sum("_t").over(offW), lit(0L)))
      .drop("_t")
    // null-SAFE join on the keys: windows and groupBy both treat a null
    // key as its own group, so a plain equijoin here would silently DROP
    // every null-key row (null never equals null) — a divergence from the
    // single-window form this replaces. Alias-qualified: offsets derives
    // from staged, so unqualified refs to the grouping columns resolve to
    // ONE attribute and the condition degenerates to always-true (the
    // q_sim_topk_pq self-lineage lesson). No broadcast hint: offsets is
    // keys×blocks rows (see ChunkBlockSize) — AQE picks the join side.
    val cond = (keys :+ "_blk")
      .map(k => col(s"s.$k") <=> col(s"o.$k")).reduce(_ && _)
    staged.as("s")
      .join(offsets.as("o"), cond)
      .select((docs.columns.map(c => col(s"s.$c")) :+
        col("s._blk") :+ col("s._local_before") :+ col("o._blk_before")): _*)
      .withColumn("tokens_before", col("_local_before") + col("_blk_before"))
      .drop("_blk", "_local_before", "_blk_before")
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014). Each round contracts the graph toward per-component stars
    * centered on the minimum id:
    *
    *   - LARGE-STAR (per node u over the symmetric adjacency): link every
    *     neighbor larger than u to m = min(N(u) ∪ {u})
    *   - SMALL-STAR (per node u over its smaller neighbors): link u and
    *     every smaller neighbor to their collective minimum
    *
    * Both steps are one groupBy + one re-join each — the same partial+final
    * shuffle shape as the rest of the engine, everything keyed on node id.
    * Round count is O(log n) even on adversarial path graphs (asserted in
    * CorpusQueriesSpec), vs the graph DIAMETER that plain min-label
    * propagation needs — on a 100 TB near-dup graph with a long duplicate
    * chain that is the difference between ~40 rounds and ~10. Each round's
    * edge set is materialized (localCheckpoint) to truncate lineage, and
    * convergence is a set-equality check on the materialized frames.
    *
    * `edges` must be (u, v) pairs; symmetry/self-loops/dups are handled
    * here. Returns (id, cluster_id) for every node with at least one edge,
    * cluster_id = the component's minimum id.
    */
  def connectedComponents(edges: DataFrame): DataFrame =
    connectedComponentsWithRounds(edges)._1

  private[queries] def connectedComponentsWithRounds(
      edges: DataFrame): (DataFrame, Int) = {
    // canonical (u <= v) pairs, deduped — self-loops kept HERE so a node
    // whose only edge is (x, x) still appears in `nodes` (and labels
    // itself); they are dropped from the working set right after
    val e0 = edges.toDF("u", "v")
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()
    // lazy over the materialized canonical frame — consumed once at the
    // end, so an eager checkpoint here would only add a job
    val nodes = e0.select(explode(array(col("u"), col("v"))).as("id")).distinct()
    // round 1's working set is a narrow FILTER over the e0 checkpoint —
    // re-materializing it was one more full job for rows the checkpoint
    // already holds (r19); later rounds still checkpoint (they carry real
    // shuffled lineage)
    var e = e0.filter(col("u") =!= col("v"))
    var rounds = 0
    // carried across rounds: this round's |e| is last round's |small| —
    // re-counting the materialized frame was one redundant job per round
    var nE = e.count()
    var converged = nE == 0
    while (!converged) {
      // large-star over the symmetric adjacency: m(u) = min(N(u) ∪ {u});
      // every neighbor v > u re-links to m — (m, v) is already canonical
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v")).distinct()
      // small-star: for each node v, its smaller neighbors us = {u : u < v}
      // plus v itself all link to min(us) — emit (m, x) for x ≠ m
      val smins = large.groupBy("v").agg(min("u").as("m"))
      val small = large.join(smins, "v")
        .select(col("m"), when(col("u") === col("m"), col("v"))
          .otherwise(col("u")).as("x"))
        .filter(col("m") =!= col("x"))
        .select(col("m").as("u"), col("x").as("v")).distinct()
        .localCheckpoint()
      // set equality on materialized frames: same size and same union size
      // (&& short-circuits — the union job only runs when the counts match)
      val nNew = small.count()
      converged = nE == nNew && e.union(small).distinct().count() == nNew
      e = small
      nE = nNew
      rounds += 1
    }
    val labels = nodes
      .join(e.select(col("v").as("id"), col("u").as("c")), Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("cluster_id"))
    (labels, rounds)
  }

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_sample_stratified",
      (s, dir) => {
        // Deterministic train/val/test split (80/10/10): the bucket is two
        // md5 nibbles of the doc id — stable across engines, runs, and
        // cluster sizes, so a split computed today reproduces bit-for-bit
        // on any re-run (the property training pipelines need; a
        // rand()-based sample has none of it). Embarrassingly parallel:
        // no shuffle at all before the output sort.
        val h = md5(col("doc_id").cast("string"))
        val bucket = pmod(nib(h, 1) * 16 + nib(h, 2), lit(100))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), bucket.as("bucket"),
            splitCol.as("split"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, $duckBucket AS bucket, $duckSplit AS split
             FROM documents ORDER BY doc_id""")),

    GQuery(
      "q_sample_weighted",
      (s, dir) => {
        // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
        // each doc draws u ~ U(0,1) and ranks by the exponential key
        // -ln(u)/w — the k smallest keys per lang are a weighted sample
        // (here w = n_chars: longer docs proportionally likelier, the
        // upsample-by-size step of a mixture recipe). u is md5-derived so
        // the "random" draw reproduces bit-for-bit on both engines and any
        // cluster size; ranking uses the ROUNDED key + doc_id (the
        // q_text_tfidf lesson — raw doubles may differ in the last ulp
        // across engines). One narrow pass + a per-lang top-k window: at
        // 100 TB this is TopKPerKey-shaped, never a global sort.
        val h = md5(col("doc_id").cast("string"))
        val uInt = (1 to 8).map(i => nib(h, i) * lit(1L << (4 * (8 - i))))
          .reduce(_ + _)
        val u = greatest(uInt.cast("double") / 4294967296.0, lit(1e-12))
        val key = r4(-log(u) * 1000.0 / col("n_chars"))
        val w = Window.partitionBy("lang").orderBy(col("k"), col("doc_id"))
        Tables.documents(s, dir)
          .filter(col("n_chars") > 0)
          .select(col("lang"), col("doc_id"), key.as("k"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .orderBy("lang", "rnk")
      },
      Some {
        val nibSql = (i: Int) =>
          s"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
        val uInt = (1 to 8).map(i => s"${nibSql(i)} * ${1L << (4 * (8 - i))}")
          .mkString(" + ")
        s"""WITH d AS (SELECT lang, doc_id,
              round(-ln(greatest(CAST($uInt AS DOUBLE) / 4294967296.0, 1e-12))
                * 1000.0 / n_chars, 4) AS k
              FROM documents WHERE n_chars > 0),
            r AS (SELECT lang, doc_id, k, row_number() OVER (
                PARTITION BY lang ORDER BY k, doc_id) AS rnk FROM d)
            SELECT lang, doc_id, k, rnk FROM r
            WHERE rnk <= 5 ORDER BY lang, rnk"""
      }),

    GQuery(
      "q_sample_temperature",
      (s, dir) => {
        // Temperature-weighted dataset mixing (the exponentiated-share
        // family of the mT5/GPT-3 mixture recipes), here with exponent
        // 1/T = 2: a source's share of the training mix is p_l ∝ n_l²,
        // which SHARPENS the distribution — high-resource sources gain
        // share relative to proportional sampling. (The mT5 low-resource
        // up-weighting is the same machinery with an exponent < 1; the
        // catalog pins 2 because integer squaring keeps the quota
        // arithmetic exact end to end.) Quotas resolve
        // by the LARGEST-REMAINDER method in EXACT integer arithmetic
        // ((target·w) div / mod wsum) — no float summation whose order
        // could disagree across engines — over the |langs|-row stats
        // frame, where the unpartitioned windows are safe because the
        // lang domain is bounded, never data-scale. Within a source the
        // selection order is the deterministic md5 draw (the
        // q_sample_weighted idiom), so the same mix reproduces on any
        // cluster. The per-lang rank is a window here (the catalog's
        // oracle-exact form); at 100 TB the identical selection is
        // TopKPerKey-shaped — quota-bounded partial heaps, no giant
        // window partition (plans/TopKPerKey.scala).
        val stats = Tables.documents(s, dir).groupBy("lang")
          .agg(count(lit(1)).as("n"))
          .withColumn("w", col("n") * col("n"))
          .localCheckpoint() // feeds totals AND quotas — stage it once
        // cross-lang totals as a 1-row broadcast join, not unpartitioned
        // windows (same exact integer sums, none of WindowExec's
        // single-partition machinery or warnings on the hot log path)
        val tot = stats.agg(sum("w").as("wsum"), sum("n").as("ntot"))
        val base = stats.crossJoin(broadcast(tot))
          .withColumn("target", expr("ntot div 2"))
          .withColumn("quota0", expr("(target * w) div wsum"))
          .withColumn("rem", expr("(target * w) % wsum"))
          .localCheckpoint()
        val qtot = base.agg(sum("quota0").as("qsum"))
        val quotas = base.crossJoin(broadcast(qtot))
          .withColumn("leftover", col("target") - col("qsum"))
          // the one remaining tiny-frame window: ranking |langs| remainders
          .withColumn("rrank", row_number().over(
            Window.orderBy(col("rem").desc, col("lang").asc)))
          .withColumn("quota",
            col("quota0") + when(col("rrank") <= col("leftover"), 1L).otherwise(0L))
          .select("lang", "quota")
        val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("rnk", row_number().over(w))
          .join(broadcast(quotas), "lang")
          .filter(col("rnk") <= col("quota"))
          .select(col("lang"), col("doc_id"), col("rnk"))
          .orderBy("lang", "rnk")
      },
      Some("""WITH stats AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            q1 AS (SELECT lang, n, n*n AS w,
                     sum(n*n) OVER () AS wsum,
                     (sum(n) OVER ()) // 2 AS target
                   FROM stats),
            q2 AS (SELECT lang, target, (target * w) // wsum AS quota0,
                     (target * w) % wsum AS rem FROM q1),
            q3 AS (SELECT lang, quota0, target,
                     sum(quota0) OVER () AS qsum,
                     row_number() OVER (ORDER BY rem DESC, lang ASC) AS rrank
                   FROM q2),
            quotas AS (SELECT lang,
                     quota0 + CASE WHEN rrank <= target - qsum THEN 1 ELSE 0 END AS quota
                   FROM q3),
            ranked AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
                   FROM documents)
            SELECT r.lang, r.doc_id, r.rnk
            FROM ranked r JOIN quotas q USING (lang)
            WHERE r.rnk <= q.quota
            ORDER BY lang, rnk""")),

    GQuery(
      "q_text_tfidf",
      (s, dir) => {
        // Per-document top TF-IDF term. Ranking orders on the
        // ROUNDED score so the DuckDB twin agrees even when ln() differs
        // in the last ulp, with the token as a total tie-break (hot tokens
        // in every doc score exactly 0.0 and would tie otherwise).
        //
        // tf is ROW-LOCAL (r18, guide §2.4 — the q_rank_bm25 shape): the
        // old explode → groupBy(doc_id, token) shuffled the corpus's full
        // token volume to compute a per-document histogram;
        // TextFunctions.runs over the sorted token array yields the
        // identical (token, tf) integers with zero exchanges. Only the
        // genuinely global steps stay distributed: the df aggregation
        // (one exchange over DISTINCT (doc, token) pairs), the corpus
        // count, and the per-doc top-1 window. The checkpoint stages the
        // tokenize once for the two consumers (tf pairs, df derivation).
        // capped spread before the tokenize (the q_rank_bm25 rationale):
        // the local scan is one split and the checkpoint has two
        // concurrent consumers
        val d = graft.Spread.ifNarrow(Tables.documents(s, dir),
            math.max(8, s.sparkContext.defaultParallelism / 4))
          .select(col("doc_id"), array_sort(tokens(col("text"))).as("ts"))
          .localCheckpoint()
        val tf = d.select(col("doc_id"),
            explode(graft.functions.TextFunctions.runs(col("ts"))).as("r"))
          .select(col("doc_id"), col("r.v").as("token"), col("r.n").as("tf"))
        val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val n = d.agg(count(lit(1)).as("n_total"))
        val scored = tf.join(broadcast(df), "token")
          .crossJoin(broadcast(n))
          .withColumn("tfidf", r4(col("tf") *
            log((col("n_total") + 1).cast("double") / (col("df") + 1))))
        scored
          .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("tfidf").desc, col("token"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("token").as("top_token"), col("tfidf"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest(${TextQueries.duckToks}) AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_total FROM documents),
            scored AS (SELECT doc_id, token,
              round(tf * ln(CAST(n_total + 1 AS DOUBLE) / (df + 1)), 4) AS tfidf
              FROM tf JOIN df USING (token) CROSS JOIN n),
            ranked AS (SELECT doc_id, token, tfidf,
              row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
              FROM scored)
            SELECT doc_id, token AS top_token, tfidf FROM ranked
            WHERE rn = 1 ORDER BY doc_id""")),

    GQuery(
      "q_pack_chunks",
      (s, dir) => {
        // Token-budget sequence chunking: stream each lang's docs in
        // doc_id order and cut a new training chunk every 512 tokens of
        // cumulative budget (chunk_id = ⌊tokens-before / 512⌋). The cumsum
        // is the two-phase blocked prefix sum (withTokensBefore) — a naive
        // PARTITION BY lang window is one task per language, and at 100 TB
        // a hot language is a multi-TB window partition.
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).as("n_tokens"))
        withTokensBefore(d, Seq("lang"))
          .withColumn("chunk_id", floor(col("tokens_before") / 512.0))
          .select("doc_id", "lang", "n_tokens", "chunk_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, lang,
              len(${TextQueries.duckToks}) AS n_tokens FROM documents)
            SELECT doc_id, lang, n_tokens,
              CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY lang
                ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS chunk_id
            FROM d ORDER BY doc_id""")),

    GQuery(
      "q_pack_chunks_bpe",
      (s, dir) => {
        // q_pack_chunks with the budget denominated in SUBWORD tokens —
        // the unit a training run actually fills (the fixture corpus runs
        // 2.3 BPE tokens per whitespace token, so a whitespace budget
        // misprices chunks by 2.3×). Per-doc counts ride the q_token_bpe
        // plumbing (frozen merge chain over DISTINCT words, joined back),
        // then the same blocked two-phase prefix sum cuts 512-subword
        // chunks per lang. ORACLE-EXACT: the DuckDB side replays the
        // identical generated replace chain.
        import graft.functions.BpeTokenizer
        val words = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            explode(tokens(col("text"))).as("word"))
        val vocab = words.select("word").distinct()
          .withColumn("nb", BpeTokenizer.bpeCountCol(col("word")))
        val d = words.join(vocab, "word")
          .groupBy("doc_id", "lang")
          .agg(sum("nb").cast("long").as("n_tokens"))
        withTokensBefore(d, Seq("lang"))
          .withColumn("chunk_id", floor(col("tokens_before") / 512.0))
          .select("doc_id", "lang", "n_tokens", "chunk_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, lang,
                unnest(${TextQueries.duckToks}) AS word FROM documents),
              v AS (SELECT word,
                ${graft.functions.BpeTokenizer.bpeCountSql("word")} AS nb
                FROM (SELECT DISTINCT word FROM w)),
              d AS (SELECT w.doc_id, w.lang,
                CAST(sum(v.nb) AS BIGINT) AS n_tokens
                FROM w JOIN v USING (word) GROUP BY 1, 2)
            SELECT doc_id, lang, n_tokens,
              CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY lang
                ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS chunk_id
            FROM d ORDER BY doc_id""")),

    GQuery(
      "q_pack_overlap",
      (s, dir) => {
        // Sliding-window chunking with overlap — the context-window prep
        // step for RAG/pretraining: each doc yields ⌈max(n-64,1)/192⌉
        // chunks of up to 256 tokens with stride 192 (64-token overlap so
        // no boundary context is lost). Pure per-row expression work
        // (sequence + explode) — embarrassingly parallel, the chunk count
        // not the text length drives output size, no shuffle before the
        // output sort.
        val n = size(tokens(col("text")))
        val nChunks = ceil(greatest(n - 64, lit(1)).cast("double") / 192.0)
          .cast("long")
        Tables.documents(s, dir)
          .select(col("doc_id"), n.as("n_tokens"), nChunks.as("n_chunks"),
            explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
          .select(
            col("doc_id"), col("n_tokens"), col("chunk_idx"),
            (col("chunk_idx") * 192).as("start_tok"),
            least(col("chunk_idx") * 192 + 256, col("n_tokens")).as("end_tok"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH d AS (SELECT doc_id, len(${TextQueries.duckToks}) AS n_tokens
                FROM documents),
              c AS (SELECT doc_id, n_tokens,
                CAST(ceil(CAST(greatest(n_tokens - 64, 1) AS DOUBLE) / 192.0)
                  AS BIGINT) AS n_chunks FROM d)
              SELECT doc_id, n_tokens, chunk_idx,
                chunk_idx * 192 AS start_tok,
                least(chunk_idx * 192 + 256, n_tokens) AS end_tok
              FROM c, UNNEST(range(n_chunks)) AS t(chunk_idx)
              ORDER BY doc_id, chunk_idx""")),

    GQuery(
      "q_dedup_semantic",
      (s, dir) => {
        // SemDeDup-shaped semantic dedup (Abbas et al., "SemDeDup", 2023):
        // cluster the embeddings (label = the cell, as in q_sim_topk_ivf),
        // compute each cell's centroid, keep the member most aligned with
        // it as the cell's representative. Centroid = one partial+final agg
        // over (label, dim); scoring re-joins the centroid table (cells ×
        // dim rows — broadcastable at any corpus size, it scales with
        // cluster count not documents); pick = one top-1 window per label.
        // No pairwise join anywhere — the point of the semantic variant vs
        // q_dedup_embcos's pair generation. All sums in exact decimal so
        // the score is order-independent and the DuckDB oracle hash-matches;
        // within a label |centroid| is constant, so ranking by dot/|v|
        // equals ranking by cosine and the centroid norm is never needed.
        // capped spread before the posexplode (the q_rank_bm25 rationale):
        // the local embeddings scan is ONE split, so the decimal-heavy
        // explode + partial aggregations ran single-core (two 0.3-0.6 s
        // one-task jobs). Exactness-safe here: every sum this query takes
        // is per-(label[, vec]) in exact DECIMAL, so partition layout
        // cannot change a digit (unlike the kmeans float paths, which
        // stay unspread by policy). The identical repartition exchange
        // appears in both consumers of `e` and is reused within the one
        // executed plan.
        val e = graft.Spread.ifNarrow(Tables.embeddings(s, dir),
            math.max(8, s.sparkContext.defaultParallelism / 4))
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
        val cent = e.groupBy("label", "dim")
          .agg((sum(col("v").cast(DecimalType(28, 10))) / count(lit(1)))
            .cast("double").as("c"))
        val scored = e.join(broadcast(cent), Seq("label", "dim"))
          .groupBy("label", "vec_id")
          .agg(
            sum((col("v").cast("double") * col("c")).cast(DecimalType(28, 10)))
              .cast("double").as("dot"),
            sqrt(sum((col("v").cast("double") * col("v")).cast(DecimalType(28, 10)))
              .cast("double")).as("vn"))
          .withColumn("score", round(col("dot") / col("vn"), 6))
        val w = Window.partitionBy("label")
          .orderBy(col("score").desc, col("vec_id"))
        scored
          .withColumn("rn", row_number().over(w))
          .withColumn("n_members", count(lit(1)).over(Window.partitionBy("label")))
          .filter(col("rn") === 1)
          .select(col("label"), col("vec_id").as("rep_id"),
            r4(col("score")).as("score"), col("n_members"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT vec_id, label, i - 1 AS dim,
                CAST(embedding[i] AS DOUBLE) AS v
                FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)),
              cent AS (SELECT label, dim,
                CAST(SUM(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
                FROM e GROUP BY 1, 2),
              sc AS (SELECT e.label, e.vec_id,
                CAST(SUM(CAST(e.v * cent.c AS DECIMAL(28,10))) AS DOUBLE) AS dot,
                sqrt(CAST(SUM(CAST(e.v * e.v AS DECIMAL(28,10))) AS DOUBLE)) AS vn
                FROM e JOIN cent ON e.label = cent.label AND e.dim = cent.dim
                GROUP BY 1, 2),
              r AS (SELECT label, vec_id, round(dot / vn, 6) AS score,
                row_number() OVER (PARTITION BY label
                  ORDER BY round(dot / vn, 6) DESC, vec_id) AS rn,
                count(*) OVER (PARTITION BY label) AS n_members
                FROM sc)
              SELECT label, vec_id AS rep_id, round(score, 4) AS score, n_members
              FROM r WHERE rn = 1 ORDER BY label""")),

    GQuery(
      "q_corpus_budget",
      (s, dir) => {
        // Data mixing under a token budget: per lang, admit docs best-
        // quality-first until 2000 tokens are claimed (a doc is in iff the
        // tokens BEFORE it under the quality ranking are inside the
        // budget — the standard greedy knapsack every mixture recipe
        // uses). Ranking key is the INTEGER micro-quality q4 plus doc_id,
        // never the raw double (the tie/rounding lesson from
        // q_text_tfidf): both engines order identically or the admitted
        // set itself would drift.
        //
        // The cumsum is the same two-phase blocked prefix sum as
        // q_pack_chunks, blocked on the QUALITY BAND (10000−q4) DIV 64 —
        // a deterministic coarsening of the (q4 desc, doc_id) order, so
        // no single window partition spans a whole language. The budget
        // adds a second scale lever the chunker doesn't have: a block
        // whose offset already exceeds the budget cannot admit ANY row,
        // so the offsets filter prunes every such block BEFORE the
        // per-row window — at 100 TB only the top quality bands of each
        // language ever reach the expensive phase.
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).as("n_tokens"),
            round(qualityFromStats(tokenStats(col("text"))) * 1e4)
              .cast("long").as("q4"))
          .withColumn("_blk", expr("(10000 - q4) DIV 64"))
          .localCheckpoint()
        val offW = Window.partitionBy("lang").orderBy("_blk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = base
          .groupBy("lang", "_blk").agg(sum("n_tokens").as("_t"))
          .withColumn("_blk_before", coalesce(sum("_t").over(offW), lit(0L)))
          .drop("_t")
          .filter(col("_blk_before") < 2000) // block-level budget pruning
        val localW = Window.partitionBy("lang", "_blk")
          .orderBy(col("q4").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        base.as("b")
          .join(offsets.as("o"),
            col("b.lang") <=> col("o.lang") && col("b._blk") <=> col("o._blk"))
          .select(col("b.doc_id"), col("b.lang"), col("b.n_tokens"),
            col("b.q4"), col("b._blk"), col("o._blk_before"))
          .withColumn("before",
            coalesce(sum("n_tokens").over(localW), lit(0L)) + col("_blk_before"))
          .filter(col("before") < 2000)
          .select(col("lang"), col("doc_id"), col("q4"),
            (col("before") + col("n_tokens")).as("cum_tokens"))
          .orderBy("lang", "doc_id")
      },
      Some {
        val all = TextFunctions.stopwords.flatMap(_._2).distinct
          .map(w => s"'$w'").mkString(",")
        s"""WITH d AS (SELECT doc_id, lang, text,
                ${TextQueries.duckToks} AS toks FROM documents),
              q AS (SELECT doc_id, lang, len(toks) AS n_tokens,
                CAST(round(greatest(0.0,
                  least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.5 +
                  least(CAST(len(list_filter(toks, t -> t IN ($all))) AS DOUBLE)
                    / len(toks) * 5.0, 1.0) * 0.5 -
                  coalesce(CAST(length(text) - length(regexp_replace(text,
                    '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                    / nullif(length(text), 0), 0.0)
                ) * 10000) AS BIGINT) AS q4
              FROM d),
              r AS (SELECT lang, doc_id, q4, n_tokens,
                coalesce(sum(n_tokens) OVER (PARTITION BY lang
                  ORDER BY q4 DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS before
              FROM q)
            SELECT lang, doc_id, q4,
              CAST(before + n_tokens AS BIGINT) AS cum_tokens
            FROM r WHERE before < 2000 ORDER BY lang, doc_id"""
      }),

    GQuery(
      "q_corpus_final",
      (s, dir) => {
        // The capstone: build the training set. Near-dup clusters from the
        // LSH pairs lose everything but their keeper (left_anti on the
        // non-keeper set — sized by the corpus's duplicate mass, so no
        // broadcast hint: AQE picks shuffle vs broadcast from actual size),
        // survivors get their deterministic split, and the output is the
        // (lang, split) manifest a training run consumes. One corpus pass +
        // the bounded dedup machinery — the full pipeline the individual
        // operators exist for.
        val edges = TextQueries.minhashPairs(s, dir).select("a_id", "b_id")
        val drops = connectedComponents(edges)
          .filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id"))
        Tables.documents(s, dir)
          .join(drops, Seq("doc_id"), "left_anti")
          .select(col("lang"), splitCol.as("split"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "split")
      },
      Some(s"""WITH RECURSIVE ${TextQueries.minhashPairsCtes},
            edges AS (SELECT a_id AS u, b_id AS v FROM mpairs
                      UNION SELECT b_id, a_id FROM mpairs),
            reach(u, v) AS (SELECT u, v FROM edges
                            UNION SELECT r.u, e.v FROM reach r
                              JOIN edges e ON r.v = e.u),
            drops AS (SELECT u AS doc_id FROM reach
                      GROUP BY u HAVING u != least(u, min(v)))
            SELECT lang, $duckSplit AS split, count(*) AS n_docs
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM drops)
            GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_dedup_clusters",
      (s, dir) => {
        // Near-dup cluster assembly: LSH pairs → connected components →
        // one keeper per cluster (the smallest doc_id). This is the
        // canonical corpus-dedup tail: pair generation bounds the
        // candidate set, CC glues overlapping pairs ("A≈B, B≈C ⇒ one
        // group"), and the keeper rule makes the drop set deterministic.
        val edges = TextQueries.minhashPairs(s, dir).select("a_id", "b_id")
        connectedComponents(edges)
          .select(col("id").as("doc_id"), col("cluster_id"),
            (col("id") === col("cluster_id")).as("keeper"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${TextQueries.minhashPairsCtes},
            edges AS (SELECT a_id AS u, b_id AS v FROM mpairs
                      UNION SELECT b_id, a_id FROM mpairs),
            reach(u, v) AS (SELECT u, v FROM edges
                            UNION SELECT r.u, e.v FROM reach r
                              JOIN edges e ON r.v = e.u)
            SELECT u AS doc_id, least(u, min(v)) AS cluster_id,
              u = least(u, min(v)) AS keeper
            FROM reach GROUP BY u ORDER BY doc_id"""))
  )
}
