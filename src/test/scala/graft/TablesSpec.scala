package graft

import java.sql.Timestamp

import org.apache.spark.sql.types.TimestampType

/** Fixture-schema drift guard (VERDICT r7 item 2).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed `events.ts`'s physical parquet encoding once (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS) NTZ), which silently broke 26 catalog queries at
  * analysis time in round 7. This suite pins `Tables.events` against tiny
  * in-repo fixtures covering every encoding seen or plausible — nanos,
  * µs-NTZ, µs-adjusted-to-UTC — asserting each loads AND yields the same
  * canonical instants, so the next drift fails loudly here before the
  * 110-query harness does.
  */
class TablesSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").toString

  private def canonical(path: String): Seq[(Long, Timestamp)] = {
    val df = Tables.eventsFrom(spark, path)
    assert(df.schema("ts").dataType == TimestampType,
      s"$path: ts must canonicalize to TimestampType, got ${df.schema("ts").dataType}")
    df.selectExpr("event_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .toSeq
      .sortBy(_._1)
  }

  test("events loader canonicalizes all three ts encodings to identical rows") {
    val ntz = canonical(fixture("events_us_ntz.parquet"))
    val utc = canonical(fixture("events_us_utc.parquet"))
    val nanos = canonical(fixture("events_nanos.parquet"))
    assert(ntz.nonEmpty && ntz.size == 5)
    assert(utc == ntz, "µs-UTC and µs-NTZ fixtures must load to identical instants")
    assert(nanos == ntz, "nanos and µs fixtures must load to identical instants")
  }

  test("nanos branch does not leave legacy conf set on the session") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val before = spark.conf.get(key) // default ("false") — getOption never returns None for defaulted confs
    canonical(fixture("events_nanos.parquet"))
    assert(spark.conf.get(key) == before,
      "loading a nanos file must not mutate session conf as a side effect")
  }

  test("live testdata events loads and ts is a usable timestamp") {
    val df = Tables.events(spark, sf001)
    assert(df.schema("ts").dataType == TimestampType)
    // The r7 failure fired at analysis time even on zero rows; exercise an
    // arithmetic-on-ts expression end-to-end.
    val n = df.selectExpr("window(ts, '1 hour')", "lag(value, 1) over (partition by user_id order by ts)")
      .count()
    assert(n > 0)
  }
}
