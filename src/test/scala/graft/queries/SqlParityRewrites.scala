package graft.queries

/** The DuckDB-oracle -> Spark SQL dialect rewrites shared by SqlParitySpec
  * (the gate) and any triage tooling: mechanical spelling differences only,
  * applied in order, so the SQL text stays derived from the oracle text.
  */
object SqlParityRewrites {
  val rules: Seq[(String, String)] = Seq(
    // DuckDB epoch() (seconds) vs Spark unix_timestamp()
    """CAST\(floor\(epoch\(([\w.]+)\)\) AS BIGINT\)""" -> "unix_timestamp($1)",
    // arg_max/max_by are the same aggregate under different names
    """\barg_max\(""" -> "max_by(",
    // IGNORE NULLS sits inside the call in DuckDB, after it in Spark
    """last_value\(vid IGNORE NULLS\)""" -> "last_value(vid) IGNORE NULLS",
    """\bstrpos\(""" -> "instr(",
    // ORDER BY inside string_agg vs Spark's WITHIN GROUP clause
    """string_agg\((\w+), '([^']*)' ORDER BY (\w+)\)""" ->
      "string_agg($1, '$2') WITHIN GROUP (ORDER BY $3)",
    // exact interpolated quantile under different names
    """\bquantile_cont\(""" -> "percentile(",
    // DuckDB's 'g' flag vs Spark's replace-all default
    """(?s)regexp_replace\(([^,]+),\s+'([^']+)',\s*'([^']*)',\s*'g'\)""" ->
      "regexp_replace($1, '$2', '$3')",
    """\bstarts_with\(""" -> "startswith(",
    // 1-based [2] vs 0-based [1] on the split-string pick
    """string_split\(c_name, '#'\)\[2\]""" -> "split(c_name, '#')[1]",
    // strftime patterns vs date_format patterns
    """strftime\((.+?), '%Y-%m'\)""" -> "date_format($1, 'yyyy-MM')",
    """strftime\((.+?), '%Y-%m-%d %H:%M:%S'\)""" ->
      "date_format($1, 'yyyy-MM-dd HH:mm:ss')",
    """strftime\((.+?), '%Y-%m-%dT%H:%M:%SZ'\)""" ->
      "date_format($1, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")",
    // date_diff('day', a, b) = b − a vs Spark's datediff(end, start)
    """date_diff\('day', ([^,]+), (DATE '[^']+')\)""" -> "datediff($2, $1)",
    // DATE + int arithmetic vs date_add
    """CAST\(CAST\(o_orderdate AS DATE\) \+ 30 AS VARCHAR\)""" ->
      "CAST(date_add(CAST(o_orderdate AS DATE), 30) AS STRING)",
    // DuckDB's 2-arg regexp_extract_all returns whole matches (group 0);
    // Spark's defaults to group 1
    """regexp_extract_all\(([^,]+), ('[^']+')\)""" ->
      "regexp_extract_all($1, $2, 0)",
    """string_split\(av, '/'\)\[1\]""" -> "split(av, '/')[0]",
    // [i:i+1] bigram slice (must precede the string_split_regex rewrite
    // that renames its anchor)
    """\(string_split_regex\(lower\(trim\(text\)\), '\\s\+'\)\)\[i:i\+1\]""" ->
      """slice(split(lower(trim(text)), '\\s+'), i, 2)""",
    """\(string_split_regex\(lower\(trim\(text\)\), '\\s\+'\)\)\[1:2\]""" ->
      """slice(split(lower(trim(text)), '\\s+'), 1, 2)""",
    // [x] array literal around the whole-doc bigram fallback
    """\[array_to_string\((.+?), ' '\)\]""" -> "array(array_join($1, ' '))",
    // list_* vocabulary → array vocabulary (lambda syntax is shared)
    """\bstring_split_regex\(""" -> "split(",
    """(?<![A-Za-z_])len\(""" -> "size(",
    """\blist_contains\(""" -> "array_contains(",
    """list_sum\(list_transform\(toks, x -> length\(x\)\)\)""" ->
      "aggregate(transform(toks, x -> length(x)), 0, (a, x) -> a + x)",
    """\blist_distinct\(""" -> "array_distinct(",
    """\blist_sort\(""" -> "array_sort(",
    """(array_sort\(array_distinct\(toks\)\))\[1:5\]""" -> "slice($1, 1, 5)",
    """\blist_filter\(""" -> "filter(",
    // the phrase row's 1-based adjacent-token picks inside its lambda
    // (q_text_phrase): t[i+1] first — its text contains "t[i"
    """(?<![.\w])t\[i\+1\]""" -> "element_at(t, CAST(i + 1 AS INT))",
    """(?<![.\w])t\[i\]""" -> "element_at(t, CAST(i AS INT))",
    """\barray_to_string\(""" -> "array_join(",
    // DuckDB's [1:3] slice syntax vs Spark's slice()
    """\(split\(lower\(trim\(text\)\), '\\s\+'\)\)\[1:3\]""" ->
      """slice(split(lower(trim(text)), '\\s+'), 1, 3)""",
    """\(list_transform\(toks, x -> x \|\| '!'\)\)\[1\]""" ->
      "(transform(toks, x -> x || '!'))[0]",
    // empty-array literal + typed cast
    """CAST\(\[\] AS VARCHAR\[\]\)""" -> "CAST(array() AS ARRAY<STRING>)",
    // FROM-comma UNNEST(range(...)) vs LATERAL VIEW explode(sequence(...));
    // arr[i] is 1-based in DuckDB, 0-based in Spark
    """, UNNEST\(range\(1, size\(arr\) \+ 1\)\) AS t\(i\)""" ->
      " LATERAL VIEW explode(sequence(1, size(arr))) t AS i",
    """arr\[i\] AS tok""" -> "arr[i - 1] AS tok",
    """, UNNEST\(range\(n_chunks\)\) AS t\(chunk_idx\)""" ->
      " LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS chunk_idx",
    // select-list unnest (lowercase in the oracles) = explode in Spark;
    // the FROM-clause UNNEST forms (uppercase) are handled above
    """\bunnest\(""" -> "explode(",
    """\blist_min\(""" -> "array_min(",
    """\blist_transform\(""" -> "transform(",
    // DuckDB's // integer division vs Spark's DIV (both sides integral)
    """ // """ -> " DIV ",
    // remaining 1-based inclusive ranges → sequence (after every specific
    // UNNEST form above has consumed its own range(...))
    """range\(1, (.+?) \+ 1\)""" -> "sequence(1, $1)",
    // the exclusive-end form range(1, n) = [1 .. n-1]
    """range\(1, size\(split\(lower\(trim\(text\)\), '\\s\+'\)\)\)""" ->
      """sequence(1, size(split(lower(trim(text)), '\\s+')) - 1)""",
    // ---- round-10 additions (retention / knn-class / resample) ----
    // general in-call IGNORE NULLS → Spark's trailing clause (the vid-
    // specific rule above consumes its own match first)
    """last_value\(([\w.]+) IGNORE NULLS\)""" -> "last_value($1) IGNORE NULLS",
    // the %Y-%m-%d strftime form (the existing '%Y-%m' rule requires the
    // literal to END there, so these don't shadow each other)
    """strftime\((.+?), '%Y-%m-%d'\)""" -> "date_format($1, 'yyyy-MM-dd')",
    // general date_diff('day', a, b) = b − a → datediff(end, start);
    // placed after the specific DATE-literal rule, which consumes first
    """date_diff\('day', ([^,]+), ([\w.]+)\)""" -> "datediff($2, $1)",
    // ---- round-8 extensions (the 38-query parity gap) ----
    // DuckDB 1-arg make_timestamp(micros) vs Spark's 6-arg form
    """\bmake_timestamp\(""" -> "timestamp_micros(",
    // epoch_us/epoch renames (epoch_us first is irrelevant: \b + word chars
    // keep epoch( from matching epoch_us()
    """\bepoch_us\(""" -> "unix_micros(",
    """\bepoch\(""" -> "unix_timestamp(",
    // strftime forms whose first argument spans lines (the (?s) duals of
    // the single-line rules above)
    """(?s)strftime\((.+?),\s*'%Y-%m-%d %H:%M:%S'\)""" ->
      "date_format($1, 'yyyy-MM-dd HH:mm:ss')",
    """(?s)strftime\((.+?),\s*'%Y-%m'\)""" -> "date_format($1, 'yyyy-MM')",
    // inclusive-end integer series under a different name
    """\bgenerate_series\(""" -> "sequence(",
    // DuckDB encode(s) = UTF-8 bytes; Spark's encode needs the charset
    """encode\(text\)""" -> "encode(text, 'UTF-8')",
    // list-literal pick, 1-based on both sides via element_at
    """\(\['jpeg','png','webp'\]\)\[([^\]]+)\]""" ->
      "element_at(array('jpeg','png','webp'), $1)",
    // widen the top md5-nibble multiplier: DuckDB ints are 64-bit, Spark's
    // ANSI INT would overflow at 15 * 2^28
    """\* 268435456 \+""" -> "* CAST(268435456 AS BIGINT) +",
    // general trailing-'g'-flag drop (Spark replaces all by default); the
    // specific forms above already consumed their matches
    """,\s*'g'\)""" -> ")",
    // the BPE char-spacing replacement: DuckDB backreferences are \1,
    // Java/Spark replacement backreferences are $1 (a \1 in a Java
    // replacement is an escaped literal '1')
    """regexp_replace\(word, '\(\.\)', ' \\1 '\)""" ->
      """regexp_replace(word, '(.)', ' \$1 ')""",
    // DuckDB string_split (literal separator) → split; safe here because
    // the string_split_regex rule above already consumed the regex form,
    // and the remaining literal separators ('  ') contain no regex
    // metacharacters
    """\bstring_split\(""" -> "split(",
    // 1-based arr[i] indexing into embeddings inside the cosine lambdas
    """(\w+)\.embedding\[i\]""" -> "element_at($1.embedding, CAST(i AS INT))",
    """(?<![.\w])embedding\[i\]""" -> "element_at(embedding, CAST(i AS INT))",
    // the CDF row's literal first-component pick (q_index_cdf), same
    // 1-based shape
    """(?<![.\w])embedding\[1\]""" -> "element_at(embedding, 1)",
    // the int8-quantized vector picks and the re-ranked embedding aliases
    // (q_sim_topk_sq), same 1-based shape as the embedding rules above
    """(\w+)\.qv\[i\]""" -> "element_at($1.qv, CAST(i AS INT))",
    """(?<![.\w])(q_emb|c_emb)\[i\]""" -> "element_at($1, CAST(i AS INT))",
    """\blist_max\(""" -> "array_max(",
    """\blist_intersect\(""" -> "array_intersect(",
    // 5-token shingle slice (the [i:i+1] bigram dual above; DuckDB list
    // slices are inclusive at both ends)
    """split\(lower\(trim\(text\)\), '\\s\+'\)\[i:i\+4\]""" ->
      """slice(split(lower(trim(text)), '\\s+'), i, 5)""",
    // FROM-comma UNNEST over any inclusive sequence (generic form of the
    // two specific rules above)
    """, UNNEST\(sequence\((.+?)\)\) AS t\((\w+)\)""" ->
      " LATERAL VIEW explode(sequence($1)) t AS $2",
    // generators over DuckDB ranges: Spark SQL UDFs can't sit under a
    // Generate, so expand the exclusive end / step inline
    """explode\(range\(\((.+?)\) DIV 16 \+ 1\)\)""" ->
      "explode(sequence(0, ($1) DIV 16))",
    """CAST\(explode\(range\(0, (.+?), 2\)\) AS INT\)""" ->
      "explode(sequence(0, $1 - 1, 2))",
    """explode\(range\(4\)\)""" -> "explode(sequence(0, 3))",
    // the shingle range under a generator (SQL UDFs are refused anywhere
    // inside a Generate): inline the exclusive end instead
    """range\(1, size\(split\(lower\(trim\(text\)\), '\\s\+'\)\) - 3\)""" ->
      """sequence(1, size(split(lower(trim(text)), '\\s+')) - 4)""",
    // minhash band-signature literal close + 1-based band/sig picks
    """\)\)\)\] AS mh""" -> ")))) AS mh",
    """mh\[band \* 2 \+ ([12])\]""" -> "element_at(mh, CAST(band * 2 + $1 AS INT))",
    """([ab]_mh)\[i\]""" -> "element_at($1, CAST(i AS INT))",
    // DuckDB xor(a, b) is the ^ operator in Spark
    """\bxor\(([^,]+), ([^)]+)\)""" -> "($1 ^ $2)",
    // signed-projection list literal, picked 1-based
    """\(\[(-?1\.0(?:,-?1\.0)*)\]\)\[i\]""" ->
      "element_at(array($1), CAST(i AS INT))",
    // the minhash band-signature list literal -> array(); the closing
    // bracket sits right before AS sigs
    """\[array_min\(""" -> "array(array_min(",
    """\)\)\)\] AS sigs""" -> ")))) AS sigs",
    // parenthesized 5-token shingle slice (the bare form is handled above)
    """\(split\(lower\(trim\(text\)\), '\\s\+'\)\)\[i:i\+4\]""" ->
      """slice(split(lower(trim(text)), '\\s+'), i, 5)""",
    // any scalar range(...) left after the specific forms above: DuckDB's
    // exclusive-end series, shimmed by SqlCompat.duck_range
    """\brange\(""" -> "duck_range(",
    """AS VARCHAR""" -> "AS STRING")

  def apply(oracleText: String): String =
    rules.foldLeft(oracleText) { case (s, (from, to)) => s.replaceAll(from, to) }
}
