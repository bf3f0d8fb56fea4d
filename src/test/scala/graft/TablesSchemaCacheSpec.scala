package graft

/** The per-path schema cache must be invisible: a cached read returns the
  * same schema and rows as a fresh inference read of the same fixture,
  * and the events loader's adaptive ts handling survives it.
  */
class TablesSchemaCacheSpec extends SparkSpec {

  test("cached table read matches a plain inference read") {
    val plain = spark.read.parquet(Tables.path(sf001, "orders"))
    // second call serves the cached schema (first call in this JVM may or
    // may not have populated it — either way the result must match)
    val t1 = Tables.orders(spark, sf001)
    val t2 = Tables.orders(spark, sf001)
    assert(t2.schema == plain.schema)
    assert(t1.schema == t2.schema)
    assert(t2.count() == plain.count())
  }

  test("events loader yields a UTC microsecond timestamp through the cache") {
    val e1 = Tables.events(spark, sf001)
    val e2 = Tables.events(spark, sf001)
    assert(e1.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(e2.schema == e1.schema)
    assert(e2.count() == e1.count())
  }
}
