package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-stats rollups (SURVEY §2.4 A5–A7) over the `events` stream table.
  * The reference's stats collector folds RPC-pushed counter records into
  * hourly buckets and combines hours into daily values
  * (CrawlerStatsCollection.java:41 combineHourlyValues, :191
  * createDailyValue); here the same two-level rollup is expressed as
  * window aggregations — `date_trunc` buckets batch-side, with the
  * Structured Streaming variant (watermark + tumbling window) proven
  * equivalent in StreamingStatsSpec.
  */
object StatsQueries {

  private val dec2 = (c: String) => col(c).cast("decimal(18,2)")

  /** Hourly rollup fragment shared by st1/st2 oracles. */
  private val HourlyCte =
    """hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type,
      |         COUNT(*) AS n_events,
      |         SUM(CAST(value AS DECIMAL(18,2))) AS sum_value_d,
      |         COUNT(DISTINCT user_id) AS n_users
      |  FROM events
      |  GROUP BY 1, 2
      |)""".stripMargin

  def defs: Seq[Q] = Seq(
    // A7 level 1: hourly stats per event type.
    Q(
      "st1_hourly_stats",
      (s, dir) =>
        Registry.table(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(dec2("value")).cast("double").as("sum_value"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("hour"), col("event_type")),
      Some(s"""
        WITH $HourlyCte
        SELECT hour, event_type, n_events,
               CAST(sum_value_d AS DOUBLE) AS sum_value, n_users
        FROM hourly
        ORDER BY hour, event_type
      """.trim),
    ),

    // A7 level 2: daily values folded FROM the hourly rollup (the
    // reference folds hour records, not raw events — combineHourlyValues
    // → createDailyValue; the two-level shape is preserved, including
    // hour-level min/max/avg inside the day).
    Q(
      "st2_daily_rollup",
      (s, dir) => {
        val hourly = Registry.table(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(dec2("value")).as("sum_value_d"))
        hourly
          .groupBy(date_trunc("day", col("hour")).as("day"), col("event_type"))
          .agg(
            sum(col("n_events")).as("n_events"),
            sum(col("sum_value_d")).cast("double").as("sum_value"),
            count(lit(1)).as("n_hours"),
            max(col("n_events")).as("peak_hour_events"),
            min(col("n_events")).as("min_hour_events"))
          .orderBy(col("day"), col("event_type"))
      },
      Some(s"""
        WITH $HourlyCte
        SELECT date_trunc('day', hour) AS day, event_type,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(sum_value_d) AS DOUBLE) AS sum_value,
               COUNT(*) AS n_hours,
               MAX(n_events) AS peak_hour_events,
               MIN(n_events) AS min_hour_events
        FROM hourly
        GROUP BY 1, 2
        ORDER BY day, event_type
      """.trim),
    ),

    // A5: conditional-sum pivot — event-type histogram per day in one
    // pass (ShardStats http-result-class pivot shape).
    Q(
      "st3_type_pivot",
      (s, dir) => {
        val types = Seq("view", "click", "purchase", "signup", "error")
        val aggs = types.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")) :+
          sum(when(col("event_type") === "purchase", dec2("value"))
            .otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double").as("purchase_value")
        Registry.table(s, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(aggs.head, aggs.tail: _*)
          .orderBy(col("day"))
      },
      Some("""
        SELECT date_trunc('day', ts) AS day,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        FROM events
        GROUP BY 1
        ORDER BY day
      """.stripMargin.trim),
    ),

    // A6-analog: per-user activity frequency — two-level aggregation
    // (events → per-user-per-day counts → per-user avg/min/max/days),
    // the blog post-frequency shape (AggregateStatsByMonth.java:49,82).
    // The per-day count average is exact: CAST(sum AS DOUBLE)/days with
    // integer operands, identical in both engines.
    Q(
      "st4_user_freq",
      (s, dir) => {
        val perDay = Registry.table(s, dir, "events")
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        perDay
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("days_active"),
            sum(col("n")).as("n_events"),
            max(col("n")).as("max_per_day"),
            min(col("n")).as("min_per_day"))
          .withColumn("avg_per_day",
            col("n_events").cast("double") / col("days_active"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH per_day AS (
          SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT user_id, days_active, n_events, max_per_day, min_per_day,
               CAST(n_events AS DOUBLE) / days_active AS avg_per_day
        FROM (
          SELECT user_id, COUNT(*) AS days_active,
                 CAST(SUM(n) AS BIGINT) AS n_events,
                 MAX(n) AS max_per_day, MIN(n) AS min_per_day
          FROM per_day GROUP BY user_id)
        ORDER BY user_id
      """.stripMargin.trim),
    ),

    // Sessionization: gap-based sessions (>30 min of inactivity starts a
    // new session) — the batch formulation of Structured Streaming's
    // session windows. DE-SKEWED two-phase form: a bare per-user window
    // would buffer one user's whole history on one task, and crawl-scale
    // event logs are bot-heavy (a crawler UA is 10⁸⁺ events). Phase 1
    // sessionizes inside (user_id, day) buckets (lag + run-sum — the
    // partition is one user's ONE DAY, 365× tighter than per-user and
    // bounded by daily volume). Phase 2 stitches sessions that span a
    // midnight: only the LAST fragment of day d can merge with the FIRST
    // fragment of day d+1 (a skipped calendar day forces a ≥24 h gap >
    // the 30-min threshold), so the stitch runs over per-(user, day)
    // SUMMARY rows — ≤366/user/year, time-bounded, never event-bounded —
    // and renumbers fragments with a cumulative runs-before offset.
    // Total order inside each bucket by (ts, event_id) keeps lag
    // deterministic; the boundary gap test reproduces the event-level
    // rule exactly (fragment end/start ARE the adjacent events' ts).
    Q(
      "st5_sessionize",
      (s, dir) => {
        val ev = Registry.table(s, dir, "events")
          .withColumn("day", to_date(col("ts")))
        val byBucket = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts"), col("event_id"))
        val newLocal = when(lag(col("ts"), 1).over(byBucket).isNull, 1L)
          .otherwise(when(
            unix_millis(col("ts")) -
              unix_millis(lag(col("ts"), 1).over(byBucket)) > 1800000L, 1L)
            .otherwise(0L))
        val frags = ev
          .withColumn("new_s", newLocal)
          .withColumn("local_idx",
            sum(col("new_s")).over(byBucket.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("day"), col("local_idx"))
          .agg(count(lit(1)).as("n_ev"),
            min(col("ts")).as("fs"), max(col("ts")).as("fe"))
        // Per-(user, day) summary: fragments are disjoint in time, so the
        // day's first event ts = min(fs), last = max(fe).
        val daySum = frags.groupBy(col("user_id"), col("day"))
          .agg(min(col("fs")).as("day_first"), max(col("fe")).as("day_last"),
            max(col("local_idx")).as("n_frags"))
        val byUserDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
        // carry = this day's first fragment continues the previous active
        // day's last session (gap ≤ 30 min; NULL gap = no previous day →
        // otherwise-0). runs-before = Σ (n_frags − carry) over prior days.
        val stitched = daySum
          .withColumn("carry", when(
            unix_millis(col("day_first")) -
              unix_millis(lag(col("day_last"), 1).over(byUserDay)) <= 1800000L, 1L)
            .otherwise(0L))
          .withColumn("before", coalesce(
            sum(col("n_frags") - col("carry"))
              .over(byUserDay.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("user_id"), col("day"), col("carry"), col("before"))
        frags.join(stitched, Seq("user_id", "day"))
          .withColumn("session_idx", col("before") + col("local_idx") - col("carry"))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(
            sum(col("n_ev")).as("n_events"),
            min(col("fs")).as("session_start"),
            max(col("fe")).as("session_end"),
            (unix_millis(max(col("fe"))) - unix_millis(min(col("fs"))))
              .as("duration_ms"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some("""
        WITH marked AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL THEN 1
                      WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1
                      ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
          SELECT user_id, event_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM marked
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS BIGINT) AS duration_ms
        FROM sessions
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
      """.stripMargin.trim),
    ),

    // Sliding (hopping) windows: 2-hour windows advancing every hour —
    // Spark's window(ts, windowDuration, slideDuration), the trend-view
    // shape (each event lands in exactly 2 overlapping windows). The
    // oracle expands each event to its 2 covering hour-aligned starts.
    // Money discipline as st1: DECIMAL(18,2) sums, cast DOUBLE at the end.
    Q(
      "st6_sliding_windows",
      (s, dir) =>
        Registry.table(s, dir, "events")
          .groupBy(
            window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(dec2("value")).cast("double").as("sum_value"),
            count_distinct(col("user_id")).as("n_users"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n_events"), col("sum_value"), col("n_users"))
          .orderBy(col("window_start"), col("event_type")),
      Some("""
        WITH expanded AS (
          SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS window_start,
                 event_type, user_id, value
          FROM events, (SELECT unnest([0, 1]) AS o)
        )
        SELECT window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM expanded
        GROUP BY 1, 2
        ORDER BY window_start, event_type
      """.stripMargin.trim),
    ),

    // A19: exponentially TIME-DECAYED activity scores — the freshness
    // signal a recrawl scheduler ranks hosts by (recent fetches count
    // fully; a week-old burst counts at 1/128). Decay runs in power-of-2
    // fixed point (weight = 2^20 >> min(age_days, 20)), so every weight
    // is an exact integer and the aggregate is order-insensitive — no
    // float exp(), no summation-order drift, SQL-replayable bit-for-bit.
    // One partial-agg'd groupBy: a host with 10^8 fetch rows folds
    // map-side; nothing is ordered, nothing is windowed.
    Q(
      "a19_decayed_activity",
      (s, dir) => {
        val cutoffMs = 1706659200000L // 2024-01-31 00:00 UTC (lg5's clock)
        val w = expr(
          s"shiftright(1048576L, cast(least(greatest(($cutoffMs - unix_millis(ts)) div 86400000, 0), 20) as int))")
        Registry.table(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(w).as("score_u"),
            max(col("ts")).as("last_ts"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(1048576 >> LEAST(GREATEST(
                 (1706659200000 - epoch_ms(ts)) // 86400000, 0), 20)::INT)
                 AS BIGINT) AS score_u,
               MAX(ts) AS last_ts
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """.stripMargin.trim),
    ),

    // st7: rolling anomaly flags over the hourly series — the ops
    // signal a crawl/ingest pipeline watches (a fetch-rate or error-rate
    // hour spiking to ≥2× its trailing-day mean). Pure integer
    // arithmetic: the flag is cnt·24 ≥ 2·Σ(trailing 24 counts), so no
    // stddev float ever enters the hash compare; hours with an
    // incomplete trailing day carry the flag false. Scale shape: the
    // corpus-sized work is the partial-agg'd groupBy to (type, hour);
    // the window then runs over the AGGREGATED series, whose partition
    // size is O(hours) — bounded by elapsed time, not by data volume
    // (a year is 8 760 rows per type however many events arrive), the
    // same bounded-partition rationale as st2's day fold.
    Q(
      "st7_anomalies",
      (s, dir) => {
        val hourly = Registry.table(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n_events"))
        val tw = Window.partitionBy(col("event_type")).orderBy(col("hour"))
          .rowsBetween(-24, -1)
        hourly
          .withColumn("trail_sum", coalesce(sum(col("n_events")).over(tw), lit(0L)))
          .withColumn("trail_n", count(lit(1)).over(tw))
          .withColumn("is_anomaly",
            col("trail_n") === 24 && col("n_events") * 24 >= col("trail_sum") * 2)
          .select("event_type", "hour", "n_events", "trail_sum", "trail_n",
            "is_anomaly")
          .orderBy("event_type", "hour")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS hour,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        w AS (
          SELECT event_type, hour, n_events,
                 CAST(COALESCE(SUM(n_events) OVER tw, 0) AS BIGINT) AS trail_sum,
                 COUNT(*) OVER tw AS trail_n
          FROM hourly
          WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, hour, n_events, trail_sum, trail_n,
               trail_n = 24 AND n_events * 24 >= trail_sum * 2 AS is_anomaly
        FROM w ORDER BY event_type, hour
      """.trim),
    ),

    // st8: session transition mining (funnel analysis) — which event
    // follows which within a session (st5's 30-minute adjacency rule),
    // counted per (src, dst) pair onto the |types|² matrix — O(25) rows
    // here, O(k²) always. DE-SKEWED like st5: the lag() runs inside
    // (user_id, day) buckets, never over a bare per-user partition.
    // Cross-midnight adjacency is recovered WITHOUT any per-user window
    // at all: the only global pairs the buckets miss are (last event of
    // day d → first event of day d+1) — any pair bridging a skipped
    // calendar day has a ≥24 h gap and fails the 30-min filter in both
    // formulations — so a per-(user, day) min_by/max_by summary
    // (partial-agg'd, one row per active day) self-joins on
    // (user, day+1) and contributes the boundary transitions.
    Q(
      "st8_transitions",
      (s, dir) => {
        val ev = Registry.table(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("day", to_date(col("ts")))
        val byBucket = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts"), col("event_id"))
        val inDay = ev
          .withColumn("src_type", lag(col("event_type"), 1).over(byBucket))
          .withColumn("gap_ms",
            unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(byBucket)))
          .where(col("src_type").isNotNull && col("gap_ms") <= 1800000L)
          .select(col("src_type"), col("event_type").as("dst_type"))
        val bounds = ev.groupBy(col("user_id"), col("day"))
          .agg(
            min_by(struct(col("event_type"), col("ts")),
              struct(col("ts"), col("event_id"))).as("first"),
            max_by(struct(col("event_type"), col("ts")),
              struct(col("ts"), col("event_id"))).as("last"))
        val cross = bounds.as("a").join(bounds.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.day") === date_add(col("a.day"), 1))
          .where(unix_millis(col("b.first.ts")) -
            unix_millis(col("a.last.ts")) <= 1800000L)
          // same null semantics as the in-day path (and the per-user
          // oracle): a NULL src event_type never emits a transition row
          .where(col("a.last.event_type").isNotNull)
          .select(col("a.last.event_type").as("src_type"),
            col("b.first.event_type").as("dst_type"))
        inDay.unionByName(cross)
          .groupBy(col("src_type"), col("dst_type"))
          .agg(count(lit(1)).as("n_transitions"))
          .orderBy("src_type", "dst_type")
      },
      Some("""
        WITH lagged AS (
          SELECT event_type AS dst_type,
                 lag(event_type) OVER w AS src_type,
                 epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS gap_ms
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT src_type, dst_type, COUNT(*) AS n_transitions
        FROM lagged
        WHERE src_type IS NOT NULL AND gap_ms <= 1800000
        GROUP BY src_type, dst_type
        ORDER BY src_type, dst_type
      """.trim),
    ),

    // st9: weekly cohort retention — users grouped by their FIRST
    // active week, counted again in every later week they return: the
    // engagement matrix behind "is the crawl-source/user base decaying".
    // Three partial-agg'd corpus passes (distinct (user, week), per-user
    // min week, the (cohort, week) rollup) and one user-keyed equi join;
    // output is O(weeks²) — time-bounded. No windows anywhere.
    Q(
      "st9_retention",
      (s, dir) => {
        val act = Registry.table(s, dir, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .distinct()
        val cohort = act.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
        act.join(cohort, "user_id")
          .groupBy("cohort_week", "week")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week")
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS week
          FROM events),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id)
        SELECT cohort_week, week, COUNT(*) AS n_users
        FROM act JOIN cohort USING (user_id)
        GROUP BY cohort_week, week
        ORDER BY cohort_week, week
      """.trim),
    ),

    // st10: ordered funnel conversion (view → click → purchase) — the
    // step the transition matrix (st8) can't answer: how many users
    // complete the ORDERED sequence, with arbitrary gaps. Min-timestamp
    // chaining: first view per user, first click strictly after it,
    // first purchase strictly after that — three partial-agg'd passes
    // and two user-keyed equi joins, NO per-user ordered window (a
    // window formulation would sort each user's whole history; the
    // chain only ever reduces to one timestamp per user per step).
    // Ties on ts break by event_id via min on the (ts, event_id)
    // struct — deterministic in both engines.
    Q(
      "st10_funnel",
      (s, dir) => {
        val ev = Registry.table(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        def first(df: org.apache.spark.sql.DataFrame, typ: String,
            after: Option[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
          val base = df.filter(col("event_type") === typ)
          val gated = after match {
            case None => base
            case Some(prev) => base.join(prev, "user_id")
              .filter(col("ts") > col("prev_ts") ||
                (col("ts") === col("prev_ts") && col("event_id") > col("prev_id")))
          }
          gated.groupBy("user_id")
            .agg(min(struct(col("ts"), col("event_id"))).as("m"))
            .select(col("user_id"), col("m.ts").as("prev_ts"),
              col("m.event_id").as("prev_id"))
        }
        val v = first(ev, "view", None)
        val c = first(ev, "click", Some(v))
        val p = first(ev, "purchase", Some(c))
        val counts = Seq(("1_view", v), ("2_click", c), ("3_purchase", p))
          .map { case (step, df) =>
            df.agg(lit(step).as("step"), count(lit(1)).as("n_users"))
          }
          .reduce(_ unionByName _)
        counts.orderBy("step")
      },
      Some("""
        WITH v AS (
          SELECT user_id, MIN({'ts': ts, 'eid': event_id}) AS m
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN({'ts': e.ts, 'eid': e.event_id}) AS m
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click'
            AND (e.ts > (v.m).ts OR (e.ts = (v.m).ts AND e.event_id > (v.m).eid))
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN({'ts': e.ts, 'eid': e.event_id}) AS m
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND (e.ts > (c.m).ts OR (e.ts = (c.m).ts AND e.event_id > (c.m).eid))
          GROUP BY e.user_id)
        SELECT step, n_users FROM (
          SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
          UNION ALL SELECT '2_click', COUNT(*) FROM c
          UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
        ORDER BY step
      """.trim),
    ),

    // ST11: per-user activity trend — the exact least-squares slope of
    // the daily event-count series, the regression aggregate (Spark's
    // regr_slope / DuckDB's regr_slope, in EXACT RATIONAL form so the
    // hashes cannot drift): slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    // with x = days since the data epoch and y = that day's count, both
    // integers. Reported as sign·(|num|·10⁶ div den) — positive-operand
    // integer division, so Spark's `div` and DuckDB's `//` agree
    // regardless of truncation convention. Width: x ≤ 29 here (30-day
    // corpus) ⇒ |num| ≤ n·29·Σy; the ppm scaling stays in int64 while a
    // user's monthly event count is < ~10¹⁰ — the growth/decline screen
    // over accounts, domains, or sources. Shape: two partial-agg'd
    // passes (user×day, then user) — nothing wider than the user
    // cardinality ever shuffles, no windows, no sorts.
    Q(
      "st11_trend_slope",
      (s, dir) => {
        val daily = Registry.table(s, dir, "events")
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
          .select(col("user_id"),
            datediff(to_date(col("day")), lit("2024-01-01").cast("date"))
              .cast("long").as("x"),
            col("y"))
        daily.groupBy("user_id")
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("user_id"), col("n_days"),
            (col("n_days") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n_days") * col("sxx") - col("sx") * col("sx")).as("den"))
          .where(col("den") > 0)
          .select(col("user_id"), col("n_days"),
            (when(col("num") < 0, -1L).otherwise(1L) *
              expr("(abs(num) * 1000000) div den")).as("slope_ppm"))
          .orderBy("user_id")
      },
      Some("""
        WITH daily AS (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) AS x,
                 COUNT(*) AS y
          FROM events GROUP BY 1, 2),
        sums AS (
          SELECT user_id, COUNT(*) AS n_days,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM daily GROUP BY 1),
        r AS (
          SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
                 CAST(n_days * sxy - sx * sy AS BIGINT) AS num,
                 CAST(n_days * sxx - sx * sx AS BIGINT) AS den
          FROM sums)
        SELECT user_id, n_days,
               CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
                    * (abs(num) * 1000000 // den) AS BIGINT) AS slope_ppm
        FROM r WHERE den > 0
        ORDER BY user_id
      """.trim),
    ),

    // ST12: SCD Type-2 interval build (the gaps-and-islands idiom, by
    // VALUE change rather than st5's time gap): per entity, collapse
    // the ordered event stream into validity intervals of a derived
    // attribute state — [valid_from, valid_to) rows with the current
    // interval open-ended (NULL valid_to), exactly the slowly-changing-
    // dimension history a warehouse maintains per URL/fetch-status or
    // account/plan. Mechanics, DE-SKEWED (the st5 two-phase discipline):
    // lag() marks state changes inside (user_id, day) buckets — bounded
    // by daily volume, never one entity's whole history on one task.
    // Unlike st5 a run persists across ANY day gap (a state change, not
    // a time gap, ends it), so the stitch window runs over per-(user,
    // day) summary rows ordered by day (≤366/user/year, time-bounded):
    // carry = previous active day's LAST event state equals this day's
    // FIRST event state, replicating the original's exact null
    // semantics (a NULL previous state always starts a run; lag <>
    // state is NULL-falsy). Global run ids come from a cumulative
    // runs-before offset, and the interval close (valid_to =
    // successor's valid_from) is an equi self-join on the DENSE
    // (user_id, run_id+1) key instead of a run-level lead() window —
    // shuffle-partitioned by (user, run), skew-free. Ties broken by
    // (ts, event_id) so the replay is deterministic in both engines.
    Q(
      "st12_scd2",
      (s, dir) => {
        // `div`, not cast-after-/: double-division + CAST rounds in
        // DuckDB but truncates in Spark — integer division agrees
        val state = expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 50")
        val ev = Registry.table(s, dir, "events")
          .withColumn("state", state)
          .withColumn("day", to_date(col("ts")))
        val byBucket = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts"), col("event_id"))
        val marked = ev
          .withColumn("chg",
            when(lag(col("state"), 1).over(byBucket).isNull ||
              lag(col("state"), 1).over(byBucket) =!= col("state"), 1L)
              .otherwise(0L))
          .withColumn("local_run",
            sum(col("chg")).over(byBucket.rowsBetween(Window.unboundedPreceding, 0)))
        val frags = marked
          .groupBy(col("user_id"), col("day"), col("local_run"), col("state"))
          .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_ev"))
        // Boundary summary at the EVENT level (first/last event state,
        // not fragment state — the null quirk can mix states in one run).
        val daySum = marked.groupBy(col("user_id"), col("day"))
          .agg(
            min_by(col("state"), struct(col("ts"), col("event_id"))).as("first_state"),
            max_by(col("state"), struct(col("ts"), col("event_id"))).as("last_state"),
            max(col("local_run")).as("n_runs"))
        val byUserDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val stitched = daySum
          .withColumn("carry",
            when(lag(col("last_state"), 1).over(byUserDay).isNull ||
              lag(col("last_state"), 1).over(byUserDay) =!= col("first_state"), 0L)
              .otherwise(1L))
          .withColumn("before", coalesce(
            sum(col("n_runs") - col("carry"))
              .over(byUserDay.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("user_id"), col("day"), col("carry"), col("before"))
        val runs = frags.join(stitched, Seq("user_id", "day"))
          .withColumn("run_id", col("before") + col("local_run") - col("carry"))
          .groupBy(col("user_id"), col("run_id"), col("state"))
          .agg(min(col("valid_from")).as("valid_from"),
            sum(col("n_ev")).as("n_events"))
        // one successor row per (user_id, run_id) GUARANTEED: the null
        // quirk ('lag <> state' is NULL-falsy) can put two states — and
        // so two `runs` rows — in one run_id, and a bare select here
        // would then fan the equi join out, duplicating intervals. The
        // run's start is min(valid_from) over its states.
        val next = runs.groupBy(col("user_id"), col("run_id"))
          .agg(min(col("valid_from")).as("valid_to"))
          .select(col("user_id"), (col("run_id") - 1).as("run_id"),
            col("valid_to"))
        runs.join(next, Seq("user_id", "run_id"), "left")
          .select(col("user_id"), col("run_id"), col("state"),
            col("valid_from"), col("valid_to"), col("n_events"))
          .orderBy("user_id", "run_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CAST(json_extract(props, '$.k') AS BIGINT) // 50 AS state
          FROM events),
        c AS (
          SELECT *,
                 CASE WHEN lag(state) OVER w IS NULL
                        OR lag(state) OVER w <> state THEN 1 ELSE 0 END AS chg
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        r AS (
          SELECT *,
                 CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
          FROM c),
        runs AS (
          SELECT user_id, run_id, state,
                 MIN(ts) AS valid_from, COUNT(*) AS n_events
          FROM r GROUP BY 1, 2, 3)
        SELECT user_id, run_id, state, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
                 AS valid_to,
               n_events
        FROM runs
        ORDER BY user_id, run_id
      """.trim),
    ),

    // ST13: DAU / trailing-7-day WAU / stickiness — the product-health
    // headline every analytics stack reports. Exact rolling DISTINCT
    // is the trap here: a window over users would buffer corpus-scale
    // state. Instead each (day, user) activity row EXPANDS to the ≤7
    // trailing report days it contributes to (a bounded ×7 fanout of
    // the day-user table — already collapsed to one row per day-user,
    // so the fanout is on deduped data), and WAU is a plain distinct
    // fold per report day — partial-agg'd, no window at all. Only
    // complete 7-day windows report (min-day via broadcast one-row
    // agg); stickiness = dau·10⁶ div wau, integer-exact. Day arithmetic
    // on integer day indexes (the st11 epoch discipline).
    Q(
      "st13_stickiness",
      (s, dir) => {
        val dayIdx = datediff(to_date(date_trunc("day", col("ts"))),
          lit("2024-01-01").cast("date")).cast("long")
        val da = Registry.table(s, dir, "events")
          .select(col("user_id"), dayIdx.as("d")).distinct()
        val dau = da.groupBy("d").agg(count(lit(1)).as("dau"))
        val wau = da.select(col("user_id"),
            explode(sequence(col("d"), col("d") + 6)).as("rd"))
          .distinct()
          .groupBy("rd").agg(count(lit(1)).as("wau"))
        val bounds = da.agg(min(col("d")).as("min_d"), max(col("d")).as("max_d"))
        dau.join(wau, col("d") === col("rd"))
          .crossJoin(broadcast(bounds))
          .where(col("d") >= col("min_d") + 6 && col("d") <= col("max_d"))
          .select(col("d").as("day_idx"), col("dau"), col("wau"),
            expr("dau * 1000000 div wau").as("stickiness_ppm"))
          .orderBy("day_idx")
      },
      Some("""
        WITH da AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) AS d
          FROM events),
        dau AS (SELECT d, COUNT(*) AS dau FROM da GROUP BY 1),
        wau AS (
          SELECT rd, COUNT(*) AS wau FROM (
            SELECT DISTINCT user_id, d + i AS rd
            FROM da, UNNEST(range(0, 7)) AS t(i))
          GROUP BY 1),
        bounds AS (SELECT MIN(d) AS min_d, MAX(d) AS max_d FROM da)
        SELECT CAST(d AS BIGINT) AS day_idx, dau, wau,
               CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
        FROM dau JOIN wau ON d = rd, bounds
        WHERE d >= min_d + 6 AND d <= max_d
        ORDER BY day_idx
      """.trim),
    ),

    // A6/A7-adjacent: st14 hour-of-week seasonality profile — the
    // capacity-planning shape behind the reference's hourly→daily stats
    // fold: how does each event type's traffic tile across the 168
    // hour-of-week cells, as a seasonality index (cell share vs the
    // uniform share, in exact ppm integers). Day-of-week and hour come
    // from raw epoch arithmetic ((days+4)%7, 1970-01-01 = Thursday) so
    // both engines compute the identical calendar with no TZ/locale
    // function semantics in play. Scale shape: one partial-agg'd fold
    // onto ≤168×types cells, per-type totals joined back as a broadcast
    // — nothing corpus-sized past the first aggregate.
    Q(
      "st14_seasonality",
      (s, dir) => {
        val cells = Registry.table(s, dir, "events")
          .select(col("event_type"),
            expr("CAST((unix_timestamp(ts) DIV 86400 + 4) % 7 AS INT)").as("dow"),
            expr("CAST((unix_timestamp(ts) DIV 3600) % 24 AS INT)").as("hour"))
          .groupBy("event_type", "dow", "hour")
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy("event_type").agg(sum(col("n")).as("total"))
        cells.join(broadcast(totals), "event_type")
          .select(col("event_type"), col("dow"), col("hour"), col("n"),
            expr("n * 168 * 1000000 DIV total").as("idx_ppm"))
          .orderBy("event_type", "dow", "hour")
      },
      Some("""
        WITH c AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 86400000 + 4) % 7 AS INT) AS dow,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hour,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2, 3),
        t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
              FROM c GROUP BY 1)
        SELECT event_type, dow, hour, n,
               CAST(n * 168 * 1000000 // total AS BIGINT) AS idx_ppm
        FROM c JOIN t USING (event_type)
        ORDER BY event_type, dow, hour
      """.trim),
    ),

    // st15: calendar gap-fill + last-observation-carried-forward — the
    // series-completeness op every dashboard/forecast consumer needs: a
    // day with no rows is DATA (a zero, or the carried prior level), not
    // a missing tick. The day spine generates from the global [min, max]
    // span (sequence() off a one-row broadcast agg — never a driver
    // loop), left-joins the per-(type, day) fold, and LOCF is
    // last(n, ignoreNulls) over the per-type ordered window — whose
    // partition is O(elapsed days), time-bounded however many events
    // arrive (the st7 rationale). A 1-in-7 event sample makes real gaps
    // for the sparse types, so zero-fill, the gap flag, and the carried
    // level are all non-vacuously hash-checked. Day indexes are raw
    // epoch-millis arithmetic (the st14 discipline — no TZ semantics).
    Q(
      "st15_gap_fill_locf",
      (s, dir) => {
        val ev = Registry.table(s, dir, "events")
          .filter(col("event_id") % 7 === 0)
          .select(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day_idx"))
        val daily = ev.groupBy("event_type", "day_idx")
          .agg(count(lit(1)).as("n"))
        val span = ev.agg(min(col("day_idx")).as("lo"),
          max(col("day_idx")).as("hi"))
        val spine = ev.select("event_type").distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(expr("sequence(lo, hi)")).as("day_idx"))
        val w = Window.partitionBy("event_type").orderBy("day_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("event_type", "day_idx"), "left")
          .withColumn("n_events", coalesce(col("n"), lit(0L)))
          .withColumn("is_gap", col("n").isNull)
          .withColumn("locf_n",
            coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L)))
          .select("event_type", "day_idx", "n_events", "is_gap", "locf_n")
          .orderBy("event_type", "day_idx")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day_idx
          FROM events WHERE event_id % 7 = 0),
        daily AS (
          SELECT event_type, day_idx, COUNT(*) AS n
          FROM ev GROUP BY 1, 2),
        span AS (SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM ev),
        spine AS (
          SELECT event_type, unnest(generate_series(lo, hi)) AS day_idx
          FROM (SELECT DISTINCT event_type FROM ev) CROSS JOIN span),
        j AS (
          SELECT s.event_type, s.day_idx, d.n
          FROM spine s LEFT JOIN daily d USING (event_type, day_idx))
        SELECT event_type, day_idx,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               n IS NULL AS is_gap,
               CAST(COALESCE(LAST_VALUE(n IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY day_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                 AS BIGINT) AS locf_n
        FROM j
        ORDER BY event_type, day_idx
      """.trim),
    ),

    // ST16: CUSUM changepoint detection over the hourly rate series —
    // the drift alarm st7's trailing-window z-test can't raise: a small
    // sustained shift (each hour individually unremarkable) accumulates
    // in the one-sided CUSUM statistic until it crosses the decision
    // band. Page's classic S_t = max(0, S_{t-1} + (x_t − μ − κ)),
    // INTEGER fixed-point so both engines agree exactly: multiply
    // through by 4·n_hours — per type, s_t = max(0, s_{t-1} +
    // 4·n_hours·x_t − 5·total) encodes drift allowance κ = μ/4, and the
    // alarm band h = 3μ becomes s > 12·total. Scale shape: the corpus
    // pass is st1's partial-agg'd hourly fold; the recursion runs in ONE
    // whitebox scan per event_type over its sorted hourly array —
    // TIME-BOUNDED state (≤8.8k hours/type/year, the st7/st14/st15
    // rationale), never corpus-bounded, and never a per-event window.
    // Hour gaps are consecutive samples by design (st15 owns gap-fill).
    Q(
      "st16_cusum_drift",
      (s, dir) => {
        val hourly = Registry.table(s, dir, "events")
          .select(col("event_type"),
            expr("unix_timestamp(ts) DIV 3600").as("h_idx"))
          .groupBy("event_type", "h_idx")
          .agg(count(lit(1)).as("n"))
        cusumScan(hourly).orderBy("event_type", "h_idx")
      },
      Some("""
        WITH RECURSIVE hourly AS (
          SELECT event_type, epoch_ms(ts) // 3600000 AS h_idx, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        tot AS (
          SELECT event_type, COUNT(*) AS n_hours,
                 CAST(SUM(n) AS BIGINT) AS total
          FROM hourly GROUP BY 1),
        seq AS (
          SELECT event_type, h_idx, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY h_idx) AS rn
          FROM hourly),
        walk(event_type, rn, h_idx, n, s) AS (
          SELECT s.event_type, s.rn, s.h_idx, s.n,
                 GREATEST(0, 4 * t.n_hours * s.n - 5 * t.total)
          FROM seq s JOIN tot t USING (event_type) WHERE s.rn = 1
          UNION ALL
          SELECT s.event_type, s.rn, s.h_idx, s.n,
                 GREATEST(0, w.s + 4 * t.n_hours * s.n - 5 * t.total)
          FROM walk w
          JOIN seq s ON s.event_type = w.event_type AND s.rn = w.rn + 1
          JOIN tot t ON t.event_type = s.event_type)
        SELECT w.event_type, w.h_idx, CAST(w.n AS BIGINT) AS n,
               CAST(w.s AS BIGINT) AS cusum, w.s > 12 * t.total AS alarm
        FROM walk w JOIN tot t USING (event_type)
        ORDER BY event_type, h_idx
      """.trim),
    ),

    // ST17: periodicity detection — exact integer lag autocorrelation of
    // the hourly rate series (the stats twin of m13's audio
    // autocorrelation): dot products Σ x_t·x_{t+L} at lags 1/12/24/168
    // expose the daily and weekly cycles st14 PROFILES but cannot
    // DETECT (st14 assumes the 168-cell grid; this measures whether the
    // cycle is there, the pre-check before trusting any seasonal
    // adjustment). Missing hours are zeros on a per-type dense spine
    // (sequence() off the per-type [min,max] — the st15 spine pattern;
    // autocorrelation over gappy indexes would be wrong). Scale shape:
    // ONE corpus-sized partial-agg to hourly; everything after is
    // time-bounded (hours/type), the lag table broadcasts, and the
    // shifted self-join keys on (type, h+L) — model-sized both sides.
    // Raw integer dots (no mean-centering): the g20 lesson — n·Σ
    // products overflow; consumers normalize on the 20-row report.
    Q(
      "st17_periodicity",
      (s, dir) => {
        val hourly = Registry.table(s, dir, "events")
          .select(col("event_type"),
            expr("unix_timestamp(ts) DIV 3600").as("h"))
          .groupBy("event_type", "h")
          .agg(count(lit(1)).as("n"))
        val bounds = hourly.groupBy("event_type")
          .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
        val dense = bounds
          .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("h"))
          .join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"), coalesce(col("n"), lit(0L)).as("x"))
          .transform(graft.ops.Iterative.materialize) // feeds both join sides
        val shifted = dense.select(col("event_type").as("et2"),
          col("h").as("h2"), col("x").as("x2"))
        dense
          .withColumn("lag",
            explode(lit(Array(1L, 12L, 24L, 168L)))) // pure fanout, no join
          .join(shifted,
            col("et2") === col("event_type") &&
              col("h2") === col("h") + col("lag"))
          .groupBy(col("event_type"), col("lag"))
          .agg(sum(col("x") * col("x2")).as("dot"),
            count(lit(1)).as("n_pairs"))
          .orderBy("event_type", "lag")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, epoch_ms(ts) // 3600000 AS h, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
              FROM hourly GROUP BY 1),
        spine AS (
          SELECT b.event_type, b.mn + t.u AS h
          FROM b, UNNEST(range(0, b.mx - b.mn + 1)) AS t(u)),
        dense AS (
          SELECT event_type, h, COALESCE(n, 0) AS x
          FROM spine LEFT JOIN hourly USING (event_type, h))
        SELECT a.event_type AS event_type, CAST(l.lag AS BIGINT) AS lag,
               CAST(SUM(a.x * c.x) AS BIGINT) AS dot,
               COUNT(*) AS n_pairs
        FROM dense a
        JOIN (VALUES (1), (12), (24), (168)) l(lag) ON true
        JOIN dense c ON c.event_type = a.event_type AND c.h = a.h + l.lag
        GROUP BY 1, 2
        ORDER BY 1, 2
      """.trim),
    ),

    // st18: seasonal-naive FORECAST backtest with an integer MASE — the
    // capacity-planning op st14/st17 stop short of: profile and detect
    // the weekly cycle, then USE it. Forecast for each type's last 24
    // hours is same-hour-last-week (y[h−168]); accuracy is the Mean
    // Absolute Scaled Error against the in-sample seasonal-naive
    // baseline, kept exact as ppm via multiply-through integer division
    // (the sign-safe div discipline — every operand non-negative). One
    // hourly fold, then everything is time-bounded (O(hours × types));
    // bounds broadcast; mase_ppm < 1e6 means "beats last week's shape",
    // −1 marks a type with no usable baseline.
    Q(
      "st18_seasonal_forecast",
      (s, dir) => {
        val hourly = Registry.table(s, dir, "events")
          .select(col("event_type"),
            expr("unix_timestamp(ts) DIV 3600").as("h"))
          .groupBy("event_type", "h")
          .agg(count(lit(1)).as("n"))
        val bounds = hourly.groupBy("event_type")
          .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
        val dense = bounds
          .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("h"))
          .join(hourly, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"), coalesce(col("n"), lit(0L)).as("x"))
          .transform(graft.ops.Iterative.materialize) // both join sides + twice
        val lagged = dense.select(col("event_type").as("et2"),
          col("h").as("h2"), col("x").as("x2"))
        val withPrev = dense
          .join(lagged, col("et2") === col("event_type") &&
            col("h2") === col("h") - 168)
          .join(broadcast(bounds), "event_type")
          .withColumn("ae", abs(col("x") - col("x2")))
        val err = withPrev.filter(col("h") >= col("mx") - 23)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_test"), sum(col("ae")).as("sum_abs_err"))
        val base = withPrev.filter(col("h") < col("mx") - 23)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_base"), sum(col("ae")).as("sum_base_err"))
        err.join(base, "event_type")
          .withColumn("mase_ppm",
            // Widen the numerator to decimal(38,0) before multiplying:
            // long history (big n_base) × high-volume types (big
            // sum_abs_err) can push the Long product past 2^63 (the
            // same reason g10 widens — Spark 4 ANSI would error, a
            // non-ANSI build would silently wrap). Quotient is a sane
            // ppm, so the final bigint cast is safe.
            when(col("sum_base_err") > 0 && col("n_test") > 0,
              expr("cast((cast(sum_abs_err as decimal(38,0)) * 1000000 " +
                "* n_base) div (cast(n_test as decimal(38,0)) " +
                "* sum_base_err) as bigint)"))
              .otherwise(lit(-1L)))
          .select("event_type", "n_test", "sum_abs_err", "n_base",
            "sum_base_err", "mase_ppm")
          .orderBy("event_type")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, epoch_ms(ts) // 3600000 AS h, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        b AS (SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
              FROM hourly GROUP BY 1),
        spine AS (
          SELECT b.event_type, b.mn + t.u AS h
          FROM b, UNNEST(range(0, b.mx - b.mn + 1)) AS t(u)),
        dense AS (
          SELECT event_type, h, COALESCE(n, 0) AS x
          FROM spine LEFT JOIN hourly USING (event_type, h)),
        wp AS (
          SELECT d.event_type, d.h, ABS(d.x - p.x) AS ae, b.mx
          FROM dense d
          JOIN dense p ON p.event_type = d.event_type AND p.h = d.h - 168
          JOIN b ON b.event_type = d.event_type),
        err AS (
          SELECT event_type, COUNT(*) AS n_test,
                 CAST(SUM(ae) AS BIGINT) AS sum_abs_err
          FROM wp WHERE h >= mx - 23 GROUP BY 1),
        base AS (
          SELECT event_type, COUNT(*) AS n_base,
                 CAST(SUM(ae) AS BIGINT) AS sum_base_err
          FROM wp WHERE h < mx - 23 GROUP BY 1)
        SELECT event_type, n_test, sum_abs_err, n_base, sum_base_err,
               CASE WHEN sum_base_err > 0 AND n_test > 0
                    THEN CAST((1000000::HUGEINT * sum_abs_err * n_base)
                         // (n_test::HUGEINT * sum_base_err) AS BIGINT)
                    ELSE -1 END AS mase_ppm
        FROM err JOIN base USING (event_type)
        ORDER BY event_type
      """.trim),
    ),

    // st19: THEIL–SEN ROBUST TREND — the outlier-proof slope next to
    // st11's OLS: per event type, the MEDIAN of all pairwise daily
    // slopes (integerized: sign·(|Δy|·10⁶ div Δx), lower median at a
    // pinned deterministic order). One bot-day that would wreck the
    // least-squares line moves the median not at all — the robust
    // trend a traffic audit wants. Scale: the pair join is over the
    // DAILY series per type (≈150 rows) — O(days²·types), bounded by
    // the time axis, never by corpus rows (the st13 discipline); the
    // per-type window sorts ≤ C(150,2) ≈ 11k rows.
    Q(
      "st19_theilsen_trend",
      (s, dir) => {
        val daily = Registry.table(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
          .select(col("event_type"),
            datediff(to_date(col("day")), lit("2024-01-01").cast("date"))
              .cast("long").as("x"),
            col("y"))
        val pairs = daily.as("a")
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.x") < col("b.x"))
          .select(col("a.event_type").as("event_type"),
            (when(col("b.y") - col("a.y") < 0, -1L).otherwise(1L) *
              expr("(abs(b.y - a.y) * 1000000) div (b.x - a.x)"))
              .as("slope_ppm"),
            col("a.x").as("xi"), col("b.x").as("xj"))
        val cnt = pairs.groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("slope_ppm"), col("xi"), col("xj"))
        pairs.withColumn("rk", row_number().over(w).cast("long"))
          .join(cnt, "event_type")
          // Lower median rank must be integer division: Column `/` is double
          // division, so for even n_pairs (rank 3.5) the equality would never
          // match and the event_type would silently drop (oracle uses `//`).
          .filter(col("rk") === expr("(n_pairs + 1) div 2"))
          .select(col("event_type"), col("n_pairs"),
            col("slope_ppm").as("theilsen_ppm"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) AS x,
                 COUNT(*) AS y
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT a.event_type,
                 CAST(CASE WHEN b.y - a.y < 0 THEN -1 ELSE 1 END
                   * (abs(b.y - a.y) * 1000000 // (b.x - a.x)) AS BIGINT)
                   AS slope_ppm,
                 a.x AS xi, b.x AS xj
          FROM daily a JOIN daily b
            ON b.event_type = a.event_type AND a.x < b.x),
        ranked AS (
          SELECT event_type, slope_ppm,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY slope_ppm, xi, xj) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
          FROM pairs)
        SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
               slope_ppm AS theilsen_ppm
        FROM ranked WHERE rk = (n_pairs + 1) // 2
        ORDER BY event_type
      """.trim),
    ),

    // st20: DAY-OF-WEEK SEASONALITY INDEX — the weekly-rhythm profile
    // every traffic/crawl scheduler reads (weekday vs weekend fetch
    // budgets, anomaly baselines that must not fire every Saturday):
    // per event_type × weekday, the count's share of the type's total
    // scaled by 7 (index 1 000 000 = perfectly flat), integer-exact
    // ppm. Weekday comes from epoch-day arithmetic anchored at a known
    // Monday (2024-01-01) on BOTH sides — the st19 discipline — so
    // Spark's 1=Sunday and DuckDB's 0=Sunday dayofweek conventions
    // never enter. Two partial-agg passes; output bounded by
    // |types| × 7.
    Q(
      "st20_dow_seasonality",
      (s, dir) => {
        val events = Registry.table(s, dir, "events")
        val dow = expr(
          "datediff(to_date(ts), to_date('2024-01-01')) % 7").cast("long")
        val perDow = events
          .select(col("event_type"), dow.as("dow"))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("cnt"))
        val totals = perDow.groupBy("event_type")
          .agg(sum(col("cnt")).as("total"))
        perDow.join(totals, "event_type")
          .select(col("event_type"), col("dow"), col("cnt"),
            expr("cnt * 7000000 div total").as("index_ppm"))
          .orderBy("event_type", "dow")
      },
      Some("""
        WITH e AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01',
                           CAST(date_trunc('day', ts) AS DATE)) % 7 AS dow
          FROM events),
        c AS (
          SELECT event_type, dow, COUNT(*) AS cnt
          FROM e GROUP BY 1, 2),
        t AS (
          SELECT event_type, SUM(cnt) AS total FROM c GROUP BY 1)
        SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow,
               CAST(c.cnt AS BIGINT) AS cnt,
               CAST(c.cnt * 7000000 // t.total AS BIGINT) AS index_ppm
        FROM c JOIN t ON t.event_type = c.event_type
        ORDER BY c.event_type, c.dow
      """.trim),
    ),
  )

  /** One CUSUM scan step (st16): absolute hour, observed count, the
    * 4·n_hours-scaled one-sided statistic, and the h = 3μ alarm. */
  final case class CusumStep(h_idx: Long, n: Long, cusum: Long, alarm: Boolean)

  /** st16's CUSUM scan over an hourly table (event_type, h_idx, n) —
    * also the serving view of the STREAMING twin (the st7 doctrine: the
    * stream maintains the O(hours) hourly state incrementally; the
    * sequential statistic recomputes over that tiny table per refresh).
    * One ObjectHashAggregate collect per type (time-bounded state),
    * then Page's recursion inside a linear whitebox scan. */
  def cusumScan(hourly: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val folded = hourly.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("h_idx"), col("n"))))
        .as("series"),
        count(lit(1)).as("n_hours"), sum(col("n")).as("total"))
    val scan = udf((series: Seq[org.apache.spark.sql.Row],
        nHours: Long, total: Long) => {
      var st = 0L
      series.map { r =>
        val h = r.getLong(0); val x = r.getLong(1)
        st = math.max(0L, st + 4L * nHours * x - 5L * total)
        CusumStep(h, x, st, st > 12L * total)
      }.toArray
    })
    folded.select(col("event_type"),
        explode(scan(col("series"), col("n_hours"), col("total"))).as("c"))
      .select(col("event_type"), col("c.h_idx"), col("c.n"),
        col("c.cusum"), col("c.alarm"))
  }
}
