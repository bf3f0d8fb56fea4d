package graft.queries

import graft.{Canon, Tables}
import org.apache.spark.sql.expressions.Window
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
              FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""")),

    GQuery(
      "q_scd2",
      (s, dir) => {
        // SCD Type-2 history build — the full-history dual of the
        // reference's last-state-wins compaction (debounce.go:127-137 keeps
        // only the newest state per key; this keeps every state WITH its
        // validity interval). Change-log compaction first (a row survives
        // only where the tracked attribute actually changed vs. lag), then
        // lead() closes each interval and row_number() versions it. Both
        // windows share one user_id partitioning — a single shuffle, per-key
        // sorts, no self-join; the standard warehouse dimension-history
        // shape at any scale.
        val w = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
        val e = Tables.events(s, dir).select(
          col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"))
        val changes = e
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        changes
          .select(
            col("user_id"),
            row_number().over(w).as("version"),
            col("event_type"),
            col("ts_s").as("valid_from"),
            lead(col("ts_s"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("user_id", "version")
      },
      Some("""WITH e AS (SELECT user_id, event_type, event_id,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
              c AS (SELECT *, lag(event_type) OVER w AS prev_type FROM e
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
              ch AS (SELECT user_id, event_type, event_id, ts_s FROM c
                     WHERE prev_type IS NULL OR prev_type <> event_type)
              SELECT user_id, row_number() OVER w2 AS version, event_type,
                ts_s AS valid_from, lead(ts_s) OVER w2 AS valid_to,
                lead(ts_s) OVER w2 IS NULL AS is_current
              FROM ch
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_s, event_id)
              ORDER BY user_id, version""")),

    GQuery(
      "q_sync_merge",
      (s, dir) => {
        // MERGE INTO semantics — the batch twin of the pipeline's
        // upsert/delete sink (A16): target = each user's last state from
        // the first half of the log (event_id <= 5000), source = the
        // second half compacted to one action per user (last-state-wins,
        // 'error' = delete — the reference's DELETE event). One full-outer
        // join on the merge key resolves all three MERGE branches:
        // matched+delete drops, matched+upsert updates, not-matched
        // inserts. Both sides are max_by compactions (partial+final, one
        // user_id shuffle each) and the join shuffles on the same key the
        // compactions already produced — the canonical warehouse CDC-apply
        // at any scale.
        val ev = Tables.events(s, dir).select(
          col("user_id"), col("event_id"), col("event_type"), col("value"))
        val target = ev.filter(col("event_id") <= 5000)
          .groupBy("user_id")
          .agg(max_by(col("value"), col("event_id")).as("t_value"))
        val source = ev.filter(col("event_id") > 5000)
          .groupBy("user_id")
          .agg(
            max_by(col("value"), col("event_id")).as("s_value"),
            (max_by(col("event_type"), col("event_id")) === "error").as("s_delete"))
        target.join(source, Seq("user_id"), "full_outer")
          .filter(!coalesce(col("s_delete"), lit(false)))
          .select(
            col("user_id"),
            r4(coalesce(col("s_value"), col("t_value"))).as("value"),
            when(col("t_value").isNull, "inserted")
              .when(col("s_value").isNull, "kept")
              .otherwise("updated").as("action"))
          .orderBy("user_id")
      },
      Some("""WITH t AS (SELECT user_id, arg_max(value, event_id) AS t_value
                FROM events WHERE event_id <= 5000 GROUP BY 1),
              s AS (SELECT user_id, arg_max(value, event_id) AS s_value,
                arg_max(event_type, event_id) = 'error' AS s_delete
                FROM events WHERE event_id > 5000 GROUP BY 1)
              SELECT coalesce(t.user_id, s.user_id) AS user_id,
                round(coalesce(s.s_value, t.t_value), 4) AS value,
                CASE WHEN t.t_value IS NULL THEN 'inserted'
                     WHEN s.s_value IS NULL THEN 'kept'
                     ELSE 'updated' END AS action
              FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
              WHERE NOT coalesce(s.s_delete, false)
              ORDER BY user_id""")),

    GQuery(
      "q_events_funnel",
      (s, dir) => {
        // Funnel conversion: per user, first signup and first purchase AT OR
        // AFTER that signup (ordered-sequence semantics — an earlier
        // purchase does not count). Two narrow pre-aggregations shuffle on
        // user_id; the purchase side joins the (already user-keyed) signup
        // frame before its own min, so no window over the raw stream and
        // every stage is partial-agg friendly at 100 TB.
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts_s").as("signup_s"))
        val purchase = ev.filter(col("event_type") === "purchase")
          .join(signup, "user_id")
          .filter(col("ts_s") >= col("signup_s"))
          .groupBy("user_id").agg(min("ts_s").as("purchase_s"))
        signup.join(purchase, Seq("user_id"), "left")
          .select(
            col("user_id"), col("signup_s"), col("purchase_s"),
            col("purchase_s").isNotNull.as("converted"),
            (col("purchase_s") - col("signup_s")).as("lat_s"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type,
                    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
              s AS (SELECT user_id, min(ts_s) AS signup_s FROM e
                    WHERE event_type = 'signup' GROUP BY 1),
              p AS (SELECT e.user_id, min(e.ts_s) AS purchase_s
                    FROM e JOIN s ON e.user_id = s.user_id
                    WHERE e.event_type = 'purchase' AND e.ts_s >= s.signup_s
                    GROUP BY 1)
              SELECT s.user_id, s.signup_s, p.purchase_s,
                p.purchase_s IS NOT NULL AS converted,
                p.purchase_s - s.signup_s AS lat_s
              FROM s LEFT JOIN p ON s.user_id = p.user_id
              ORDER BY s.user_id""")),

    GQuery(
      "q_events_retention",
      (s, dir) => {
        // COHORT RETENTION (round 10): users grouped by first-signup week,
        // counted as active in each later week they produced ANY event —
        // the other classic product-analytics shape next to the funnel
        // (funnel = ordered conversion; retention = presence over time).
        // Two user_id-keyed pre-aggregations (first signup week, distinct
        // active weeks) shuffle once each, join on the key they already
        // share, and the final rollup groups the tiny (cohort, offset)
        // matrix — events-scale data never crosses a second shuffle. Week
        // offsets subtract WEEK-ALIGNED timestamps, so the day diff is an
        // exact multiple of 7 in both engines (no week-epoch convention
        // to disagree on).
        val ev = Tables.events(s, dir)
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(min(date_trunc("week", col("ts"))).as("cohort_wk"))
        val active = ev
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        cohort.join(active, "user_id")
          .filter(col("wk") >= col("cohort_wk"))
          .withColumn("week_offset",
            (datediff(col("wk"), col("cohort_wk")) / 7).cast("int"))
          .groupBy("cohort_wk", "week_offset")
          .agg(countDistinct("user_id").as("active_users"))
          .select(
            date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"), col("active_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH cohort AS (SELECT user_id,
                    min(date_trunc('week', ts)) AS cohort_wk
                    FROM events WHERE event_type = 'signup' GROUP BY 1),
              act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                    FROM events)
              SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
                CAST(date_diff('day', c.cohort_wk, a.wk) / 7 AS INT)
                  AS week_offset,
                count(DISTINCT c.user_id) AS active_users
              FROM cohort c JOIN act a ON c.user_id = a.user_id
              WHERE a.wk >= c.cohort_wk
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    GQuery(
      "q_events_resample",
      (s, dir) => {
        // TIME-SERIES RESAMPLE + FORWARD FILL (round 10): project each
        // user's irregular event stream onto a fixed 1-hour grid spanning
        // their first→last active hour, carrying the last observed value
        // across empty slots (~91% of slots at sf0.1 are gaps) — the
        // gap-fill primitive of every time-series store, and the third
        // product-analytics face next to funnel (order) and retention
        // (presence). Scale shape: the per-hour last-observation pre-agg
        // shuffles events ONCE on user_id (hash agg on (user_id, hour)
        // then span on user_id reuse the same key family); the grid
        // explodes from a 2-column per-user span row, so its size is
        // users × span-hours — independent of event volume — and the
        // left join + fill window run on user_id-partitioned data.
        // Determinism: the in-hour survivor breaks ties on (ts, event_id),
        // the fill is a frame-sequential carry of that survivor, and the
        // first grid slot is by construction an observed hour, so the
        // carry never reads an empty frame.
        val ev = Tables.events(s, dir)
        val obs = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("slot"))
          .agg(max_by(col("value"),
            struct(col("ts"), col("event_id"))).as("obs"))
        val grid = obs.groupBy("user_id")
          .agg(min("slot").as("t0"), max("slot").as("t1"))
          .select(col("user_id"),
            explode(sequence(col("t0"), col("t1"),
              expr("interval 1 hour"))).as("slot"))
        val wFill = Window.partitionBy("user_id").orderBy("slot")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(obs, Seq("user_id", "slot"), "left")
          .withColumn("value",
            r4(last(col("obs"), ignoreNulls = true).over(wFill)))
          .select(col("user_id"), fmtTs(col("slot")).as("slot_ts"),
            col("value"), col("obs").isNull.cast("int").as("is_gap"))
          .orderBy("user_id", "slot_ts")
      },
      Some("""WITH hourly AS (
                SELECT user_id,
                       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slot,
                       value AS v,
                       row_number() OVER (
                         PARTITION BY user_id, date_trunc('hour', ts)
                         ORDER BY ts DESC, event_id DESC) AS rn
                FROM events),
              obs AS (SELECT user_id, slot, v AS obs FROM hourly WHERE rn = 1),
              span AS (SELECT user_id, min(slot) AS t0, max(slot) AS t1
                       FROM obs GROUP BY 1),
              grid AS (SELECT user_id,
                       unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
                       FROM span)
              SELECT g.user_id, strftime(g.slot, '%Y-%m-%d %H:%M:%S') AS slot_ts,
                     round(last_value(o.obs IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.slot
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       4) AS value,
                     CAST(o.obs IS NULL AS INT) AS is_gap
              FROM grid g LEFT JOIN obs o
                ON g.user_id = o.user_id AND g.slot = o.slot
              ORDER BY 1, 2""")),

    GQuery(
      "q_events_anomaly",
      (s, dir) => {
        // Time-series ANOMALY DETECTION: flag hours whose event count is a
        // > 3σ outlier of that event_type's hourly-count distribution —
        // the monitoring/alerting query of a metrics store. The z-score
        // test runs in EXACT integer arithmetic: with per-type n hours,
        // S = Σc, S2 = Σc², the test c > μ + 3σ multiplies through by n²
        // into  n·c − S > 0  ∧  (n·c − S)² > 9·(n·S2 − S²)  — counts are
        // integers, so no float mean/stddev whose summation order could
        // flip a borderline flag across engines. The squares run in
        // DECIMAL(38,0): at 100 TB scale (c ~ 1e10, n ~ 1e5 hours) the
        // deviation is ~1e15 and its square ~1e30 — inside 38 digits,
        // while BIGINT would overflow. Two narrow shuffles (type×hour
        // pre-agg, then the per-type stats rollup over the already
        // hour-granular frame) and a stats join back that broadcasts at
        // |event_types| rows. The ~1e15 envelope is ENFORCED, not assumed:
        // past it (or on an upstream DECIMAL overflow surfacing as null),
        // dev² would overflow precision 38 and non-ANSI semantics would
        // null the product — silently DROPPING a genuine anomaly — so the
        // filter raises instead of answering wrong (|dev| ≤ 1e18 keeps
        // dev² ≤ 1e36; varn ≤ 1e37 keeps 9·varn < 1e38).
        import org.apache.spark.sql.types.DecimalType
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val stats = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
            sum(col("cnt") * col("cnt")).as("s2"))
        val nD = col("n").cast(DecimalType(38, 0))
        val dev = nD * col("cnt") - col("s")
        val varn = nD * col("s2") - col("s").cast(DecimalType(38, 0)) * col("s")
        val devLim = lit(new java.math.BigDecimal("1000000000000000000"))
        val varLim = lit(new java.math.BigDecimal("1" + "0" * 37))
        hourly.join(broadcast(stats), "event_type")
          .filter(
            when(dev.isNull || varn.isNull ||
                abs(dev) > devLim || varn > varLim,
              raise_error(lit("q_events_anomaly: z-score inputs exceed " +
                "the exact DECIMAL(38,0) envelope — the integer test " +
                "would silently null out")))
            .otherwise(dev > 0 && dev * dev > varn * 9))
          .select(col("event_type"),
            date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
            col("cnt"), col("n"), col("s"))
          .orderBy("event_type", "hour_ts")
      },
      Some("""WITH hourly AS (
                SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
                FROM events GROUP BY 1, 2),
              stats AS (
                SELECT event_type, count(*) AS n, sum(cnt) AS s,
                       sum(cnt * cnt) AS s2
                FROM hourly GROUP BY 1)
              SELECT h.event_type, strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour_ts,
                     h.cnt, CAST(t.n AS BIGINT) AS n, CAST(t.s AS BIGINT) AS s
              FROM hourly h JOIN stats t USING (event_type)
              WHERE t.n * h.cnt - t.s > 0
                AND CAST(t.n * h.cnt - t.s AS DECIMAL(38,0)) *
                    CAST(t.n * h.cnt - t.s AS DECIMAL(38,0))
                    > 9 * CAST(t.n * t.s2 - t.s * t.s AS DECIMAL(38,0))
              ORDER BY 1, 2""")))
}
