package graft.queries

import graft.{Canon, Tables}
import org.apache.spark.sql.functions._

/** Event-time windowing (tumbling / sliding / session) run in batch mode —
  * the same `window`/`session_window` operators the streaming pipeline uses
  * (Structured Streaming batch/stream unification), oracle-checked against
  * hand-rolled SQL window bucketing. The streaming forms (watermarks,
  * triggers, state) are exercised in the ScalaTest streaming suites.
  */
object StreamBatchQueries {
  import Canon._

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_stream_tumbling",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("total"))
          .select(
            fmtTs(col("window.start")).as("ws"),
            col("event_type"), col("n"), col("total"))
          .orderBy("ws", "event_type")
      },
      Some(s"""SELECT strftime(make_timestamp(
                CAST(floor(epoch(ts) / 3600) * 3600 * 1000000 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS ws,
              event_type, count(*) AS n,
              round(${sql.dsum("value")}, 4) AS total
              FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_stream_sliding",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("total"))
          .select(fmtTs(col("window.start")).as("ws"), col("n"), col("total"))
          .orderBy("ws")
      },
      Some(s"""SELECT strftime(make_timestamp(CAST(
                (floor((epoch(ts) - k.k * 1800) / 3600) * 3600 + k.k * 1800)
                * 1000000 AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ws,
              count(*) AS n, round(${sql.dsum("value")}, 4) AS total
              FROM events, (VALUES (0), (1)) AS k(k)
              GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_stream_session",
      (s, dir) => {
        // session_window: quiet-period sessionization — the event-time form
        // of the reference's per-key debounce (debounce.go:123-149).
        Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), r4(dsum(col("value"))).as("total"))
          .select(
            col("user_id"),
            fmtTs(col("session_window.start")).as("session_start"),
            col("n"), col("total"))
          .orderBy("user_id", "session_start")
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS tus FROM events),
              d AS (SELECT *, CASE WHEN tus - lag(tus) OVER w >= 1800000000
                               OR lag(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
                    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
              s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid FROM d)
              SELECT user_id,
                strftime(make_timestamp(min(tus)), '%Y-%m-%d %H:%M:%S') AS session_start,
                count(*) AS n, round(${sql.dsum("value")}, 4) AS total
              FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""")))
}
