package graft.queries

import graft.{Canon, Tables}
import org.apache.spark.sql.functions._

/** Set operations + batch deduplication (SURVEY.md §2.B). q_dedup_latest is
  * the batch form of the reference's last-state-wins semantics
  * (debounce.go:127-137): one hash aggregation with max_by — a single
  * shuffle on the key, no window sort needed.
  */
object SetQueries {
  import Canon._

  private def users(s: org.apache.spark.sql.SparkSession, dir: String, tpe: String) =
    Tables.events(s, dir).filter(col("event_type") === tpe).select(col("user_id"))

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_set_union",
      (s, dir) =>
        users(s, dir, "error").union(users(s, dir, "purchase"))
          .distinct()
          .orderBy("user_id"),
      Some("""SELECT user_id FROM events WHERE event_type = 'error'
             UNION
             SELECT user_id FROM events WHERE event_type = 'purchase'
             ORDER BY user_id""")),

    GQuery(
      "q_set_intersect",
      (s, dir) =>
        users(s, dir, "signup").intersect(users(s, dir, "purchase"))
          .orderBy("user_id"),
      Some("""SELECT user_id FROM events WHERE event_type = 'signup'
             INTERSECT
             SELECT user_id FROM events WHERE event_type = 'purchase'
             ORDER BY user_id""")),

    GQuery(
      "q_set_except",
      (s, dir) =>
        users(s, dir, "signup").except(users(s, dir, "purchase"))
          .orderBy("user_id"),
      Some("""SELECT user_id FROM events WHERE event_type = 'signup'
             EXCEPT
             SELECT user_id FROM events WHERE event_type = 'purchase'
             ORDER BY user_id""")),

    GQuery(
      "q_set_exceptall",
      (s, dir) =>
        users(s, dir, "click").exceptAll(users(s, dir, "view"))
          .groupBy("user_id").agg(count(lit(1)).as("n"))
          .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n FROM (
               SELECT user_id FROM events WHERE event_type = 'click'
               EXCEPT ALL
               SELECT user_id FROM events WHERE event_type = 'view')
             GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_dedup_latest",
      (s, dir) => {
        // Last-state-wins per (user_id, event_type): the batch analog of the
        // reference's pending-map overwrite (debounce.go:127-137).
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"), col("event_type"), col("value"),
            unix_timestamp(col("ts")).as("ts_s"))
          .groupBy("user_id", "event_type")
          .agg(
            max_by(col("event_id"), struct(col("ts_s"), col("event_id"))).as("last_event"),
            max_by(r4(col("value")), struct(col("ts_s"), col("event_id"))).as("last_value"),
            count(lit(1)).as("n_superseded"))
          .orderBy("user_id", "event_type")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, value,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
             r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                     ORDER BY ts_s DESC, event_id DESC) AS rn,
                   count(*) OVER (PARTITION BY user_id, event_type) AS n_superseded
                   FROM e)
             SELECT user_id, event_type, event_id AS last_event,
                    round(value, 4) AS last_value, n_superseded
             FROM r WHERE rn = 1 ORDER BY user_id, event_type""")))
}
