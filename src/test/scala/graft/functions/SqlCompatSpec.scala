package graft.functions

import graft.SparkSpec

/** Edge contracts of the DuckDB-compat SQL-defined functions: they must
  * mirror DuckDB, not merely "work on the oracle corpus".
  */
class SqlCompatSpec extends SparkSpec {

  test("list_sum: values, empty array, null element, null array") {
    SqlCompat.register(spark)
    val r = spark.sql(
      """SELECT list_sum(array(1.5d, 2.5d)) AS a,
        |       list_sum(array()) AS b,
        |       list_sum(array(1.0d, CAST(NULL AS DOUBLE))) AS c,
        |       list_sum(CAST(NULL AS ARRAY<DOUBLE>)) AS d""".stripMargin).head()
    assert(r.getDouble(0) == 4.0)
    assert(r.isNullAt(1), "empty list sums to NULL (SUM over zero rows), as DuckDB")
    assert(r.getDouble(2) == 1.0, "NULL elements are skipped, as DuckDB's SUM does")
    assert(r.isNullAt(3))
  }

  test("duck_range: exclusive end, empty, and inverted series") {
    SqlCompat.register(spark)
    val r = spark.sql(
      """SELECT duck_range(1, 4) AS a, duck_range(1, 1) AS b,
        |       duck_range(3, 1) AS c, size(duck_range(0, 64)) AS n""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(r.getSeq[Long](1) == Seq.empty)
    assert(r.getSeq[Long](2) == Seq.empty, "inverted bounds are empty, never descending")
    assert(r.getInt(3) == 64)
  }

  test("registration is idempotent and analyzer-inlined (no UDF in the plan)") {
    SqlCompat.register(spark)
    SqlCompat.register(spark)
    val df = spark.sql("SELECT list_sum(transform(duck_range(0, 3), x -> CAST(x AS DOUBLE))) AS s")
    assert(df.head().getDouble(0) == 3.0)
    // SQL UDFs inline to aggregate/sequence expressions at analysis time
    val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("scalaudf"), s"expected no JVM UDF node, got:\n$plan")
  }
}
