package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}

/** SQL-front-end parity: every SQL-expressible relational catalog query must
  * produce the same result when run as `spark.sql` TEXT over temp views as
  * its DataFrame form does — a user of a Spark-native analytics engine
  * writes SQL first, so the catalog's semantics cannot be DataFrame-only.
  *
  * The SQL source is the query's own DuckDB oracle string wherever that
  * dialect is also valid Spark SQL (`verbatim` — the shared-ANSI core:
  * projections, joins, aggregation, windows, sets). Where DuckDB spells a
  * function differently (strpos/string_split/strftime/...), `translated`
  * carries the same semantics in Spark's dialect — the point is that the
  * semantics round-trip through SQL text, not that Spark parses DuckDB.
  * Queries that CANNOT round-trip (custom UDAF / kernel-typed results with
  * no registered SQL twin) are listed in COVERAGE.md, not silently skipped.
  *
  * Both sides run in the same session at sf0.001; results compare as
  * (column-name-sorted, row-sorted, 4-decimal-canonical) multisets — the
  * driver's own compare discipline.
  */
class SqlParitySpec extends SparkSpec {

  private val dir = sf001

  private def registerViews(): Unit =
    Tables.names.foreach(t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t))

  /** Canonical cell: numbers to 4-decimal plain strings (int 5, long 5,
    * double 5.0 and decimal 5.0000 all → "5"), containers recursively.
    */
  private def canonCell(v: Any): String = v match {
    case null => "∅"
    case n @ (_: java.lang.Double | _: java.lang.Float | _: java.math.BigDecimal |
        _: scala.math.BigDecimal | _: java.lang.Long | _: java.lang.Integer |
        _: java.lang.Short | _: java.lang.Byte) =>
      new java.math.BigDecimal(n.toString)
        .setScale(4, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString
    case s: Seq[_] => s.map(canonCell).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, mv) => s"$k:${canonCell(mv)}" }.toSeq.sorted
        .mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => r.toSeq.map(canonCell).mkString("(", ",", ")")
    case b: Array[Byte] => java.util.Arrays.toString(b)
    case x => x.toString
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map(canonCell).mkString("|")).toSeq.sorted
  }

  /** Queries whose DuckDB oracle text is valid Spark SQL as-is. */
  private val verbatim = Seq(
    "q_scan_count", "q_proj_net", "q_filter_complex", "q_filter_allowblock",
    "q_join_inner", "q_join_outer", "q_join_full", "q_join_semi",
    "q_join_anti", "q_join_merge", "q_join_cross", "q_join_star",
    "q_sort_global", "q_sort_within", "q_sort_topk",
    "q_agg_pricing", "q_agg_distinct", "q_agg_rollup", "q_agg_cube",
    "q_agg_gsets", "q_agg_filtered", "q_agg_minmaxby", "q_agg_histogram",
    "q_agg_salted",
    "q_win_rank", "q_win_dist", "q_win_topk",
    "q_set_union", "q_set_intersect", "q_set_except", "q_set_exceptall",
    "q_dedup_exact",
    "q_fn_math", "q_fn_conditional", "q_fn_map", "q_fn_json",
    "q_agg_pivot", "q_agg_unpivot",
    "q_text_stats", "q_kube_annotations", "q_sync_diff")

  /** Queries whose oracle text differs from Spark SQL only by these
    * mechanical dialect spellings (regex → replacement, applied in order) —
    * the SQL source is the oracle text with the rewrites applied, so the
    * two stay in sync by construction.
    */
  private val dialectRewrites: Seq[(String, String)] = Seq(
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
    """AS VARCHAR""" -> "AS STRING")

  private val translated: Seq[String] = Seq(
    "q_join_range", "q_join_asof", "q_win_lag", "q_win_frames", "q_win_gaps",
    "q_dedup_latest", "q_events_funnel", "q_scd2", "q_sync_merge",
    "q_sample_stratified",
    "q_agg_collect", "q_agg_quantile", "q_fn_string", "q_fn_datetime",
    "q_fn_array", "q_fn_generator",
    "q_token_count", "q_kube_id", "q_pack_overlap", "q_text_entropy",
    "q_text_quality", "q_text_fingerprint", "q_corpus_datasheet",
    "q_pack_chunks", "q_text_langid", "q_text_boilerplate")

  test("verbatim oracle SQL ≡ DataFrame form, query by query") {
    registerViews()
    val failures = verbatim.flatMap { name =>
      val oracle = SparkEntry.oracleSql(name)
      try {
        val sqlRows = canon(spark.sql(oracle))
        val dfRows = canon(SparkEntry.queries(name)(spark, dir))
        if (sqlRows == dfRows) None
        else Some(s"$name: MISMATCH sql=${sqlRows.size} rows df=${dfRows.size} " +
          s"firstDiff=${sqlRows.zip(dfRows).find(p => p._1 != p._2)
            .orElse(Some((sqlRows.headOption.getOrElse(""), dfRows.headOption.getOrElse(""))))}")
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("dialect-rewritten oracle SQL ≡ DataFrame form, query by query") {
    registerViews()
    // DuckDB string literals are raw; match that for the SQL texts so the
    // oracle's regex literals ('\s+') survive the Spark parser unchanged
    val escConf = "spark.sql.parser.escapedStringLiterals"
    val prev = spark.conf.get(escConf)
    spark.conf.set(escConf, "true")
    val failures =
      try translated.flatMap { name =>
        val text = dialectRewrites.foldLeft(SparkEntry.oracleSql(name)) {
          case (s, (from, to)) => s.replaceAll(from, to)
        }
        try {
          val sqlRows = canon(spark.sql(text))
          val dfRows = canon(SparkEntry.queries(name)(spark, dir))
          if (sqlRows == dfRows) None
          else Some(s"$name: MISMATCH sql=${sqlRows.size} rows df=${dfRows.size}")
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      } finally spark.conf.set(escConf, prev)
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
