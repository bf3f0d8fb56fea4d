package graft.functions

import org.apache.spark.sql.SparkSession

/** DuckDB-dialect compatibility shim: a handful of SQL-DEFINED functions
  * (Spark 4 `CREATE TEMPORARY FUNCTION … RETURN <expr>`) that give
  * DuckDB-spelled list/series helpers their Spark semantics, so SQL text
  * written against the DuckDB oracle dialect runs on the engine unchanged
  * where a pure rename rewrite can't express the difference:
  *
  *   - `list_sum(xs)`  — DuckDB's list sum; Spark has no array-sum builtin
  *     and the textual rewrite to `aggregate(...)` cannot find the closing
  *     paren of an arbitrary nested argument. A SQL UDF takes the argument
  *     as a value and sidesteps parsing entirely.
  *   - `duck_range(a, b)` — DuckDB's EXCLUSIVE-end `range` vs Spark's
  *     inclusive `sequence`, including the empty-series edge
  *     (`range(1, 1)` = [] where `sequence(1, 0)` would DESCEND). Named
  *     `duck_range` because Spark refuses to shadow its built-in `range`;
  *     the dialect rewrite layer renames call sites.
  *
  * SQL-defined functions are inlined into the plan as Catalyst expressions
  * at analysis time — no JVM closure, fully codegen'd, exactly as if the
  * user had written the RETURN expression inline. Registration is explicit
  * and session-scoped (TEMPORARY): call [[register]] where DuckDB-dialect
  * SQL is expected (the SQL parity gate does; the catalog itself never
  * depends on these).
  */
object SqlCompat {

  def register(spark: SparkSession): Unit = {
    // DuckDB list_sum = SUM over the list's rows: NULL elements are
    // skipped, and an empty or all-NULL list sums to NULL (not 0)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION list_sum(xs ARRAY<DOUBLE>)
        |RETURNS DOUBLE
        |RETURN CASE
        |  WHEN size(filter(xs, x -> x IS NOT NULL)) = 0 THEN CAST(NULL AS DOUBLE)
        |  ELSE aggregate(filter(xs, x -> x IS NOT NULL),
        |                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
        |END
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION duck_range(a BIGINT, b BIGINT)
        |RETURNS ARRAY<BIGINT>
        |RETURN CASE WHEN b > a THEN sequence(a, b - 1) ELSE array() END
        |""".stripMargin)
  }
}
