package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two SURVEY §2.B scalar declarations with no DuckDB twin —
  * schema_of_json (returns engine-specific DDL text) and to_utc_timestamp
  * (tz-database semantics) — pinned here with literal expectations instead
  * of an oracle query.
  */
class ScalarEdgeSpec extends SparkSpec {

  test("schema_of_json infers the events.props payload shape") {
    // schema_of_json requires a foldable argument (it runs at analysis time)
    val ddl = spark.range(1)
      .select(schema_of_json(lit("""{"page":"/checkout","amount":12.5,"items":3}""")).as("s"))
      .head().getString(0)
    assert(ddl == "STRUCT<amount: DOUBLE, items: BIGINT, page: STRING>", ddl)
  }

  test("to_utc_timestamp converts zoned wall-clock to UTC instants") {
    import spark.implicits._
    val out = Seq("2026-03-15 12:00:00").toDF("t")
      .select(
        date_format(to_utc_timestamp(col("t"), "America/New_York"), "yyyy-MM-dd HH:mm:ss").as("ny"),
        date_format(to_utc_timestamp(col("t"), "Asia/Tokyo"), "yyyy-MM-dd HH:mm:ss").as("jp"))
      .head()
    // 2026-03-15 is after the US DST switch: NY = UTC-4; Tokyo = UTC+9 always
    assert(out.getString(0) == "2026-03-15 16:00:00")
    assert(out.getString(1) == "2026-03-15 03:00:00")
  }
}
