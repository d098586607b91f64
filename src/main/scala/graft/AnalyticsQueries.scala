package graft

import graft.core._
import graft.ops.{Cluster, Decontaminate, Dedup, Multimodal, Packing, Similarity, TextAnalysis}
import graft.views._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-analytics + time-series + profiling queries: funnel/retention/paths/affinity, resample/trend/zscore/EWMA, outliers/winsorize (SURVEY §2.5).
  *
  * A pure round-8 relocation of [[SparkEntry]] catalog entries (r7
  * verdict #7) — zero renames, zero semantic changes; the driver
  * contract stays on [[SparkEntry.queries]]/[[SparkEntry.oracleSql]],
  * which merge the per-domain objects. Shared fixtures/caches live in
  * [[EntryHelpers]].
  */
private[graft] object AnalyticsQueries {
  import EntryHelpers._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> ((s, dir) =>
      // ordered funnel view -> click -> purchase by log seq: per-user
      // first-occurrence chain, nulls where the user fell out
      graft.ops.Funnel.funnel(t(s, dir, "events"), "user_id",
          col("event_id"), col("event_type"), Seq("view", "click", "purchase"))
        .orderBy("user_id")),
    "q_funnel_counts" -> ((s, dir) =>
      // the funnel summary: users reaching AT LEAST each stage
      graft.ops.Funnel.funnelCounts(t(s, dir, "events"), "user_id",
        col("event_id"), col("event_type"), Seq("view", "click", "purchase"))),
    "q_funnel_windowed" -> ((s, dir) =>
      // the expiring funnel: each stage must fire within 24h of the
      // previous chosen stage's event (greedy by seq, gap on event ts)
      graft.ops.Funnel.funnel(t(s, dir, "events"), "user_id",
          col("event_id"), col("event_type"), Seq("view", "click", "purchase"),
          tsCol = Some(tsMs(s, dir)), maxGap = Some(86400000L))
        .orderBy("user_id")),
    "q_funnel_total_window" -> ((s, dir) =>
      // the total-conversion-window funnel (ClickHouse windowFunnel
      // semantic): every stage must fire within 48h of the CHOSEN
      // first view — gap anchored on stage 1, not the previous stage
      graft.ops.Funnel.funnel(t(s, dir, "events"), "user_id",
          col("event_id"), col("event_type"), Seq("view", "click", "purchase"),
          tsCol = Some(tsMs(s, dir)), maxGap = Some(172800000L), gapFrom = "first")
        .orderBy("user_id")),
    "q_funnel_counts_windowed" -> ((s, dir) =>
      // the expiring funnel's summary: keys reaching at least each
      // stage under the 24h per-transition gap
      graft.ops.Funnel.funnelCounts(t(s, dir, "events"), "user_id",
        col("event_id"), col("event_type"), Seq("view", "click", "purchase"),
        tsCol = Some(tsMs(s, dir)), maxGap = Some(86400000L))),
    "q_type_affinity" -> ((s, dir) =>
      // association rules over event types: per-user distinct type
      // sets, pairwise co-occurrence, floored-ppm support and lift
      graft.ops.Affinity.typeAffinity(t(s, dir, "events"), "user_id", col("event_type"))
        .orderBy("type_a", "type_b")),
    "q_event_paths" -> ((s, dir) =>
      // top trigram navigation paths within 10-minute-gap sessions,
      // (ms, seq)-ordered so clock ties break on the log's own seq
      graft.ops.Paths.topPaths(t(s, dir, "events"), "user_id",
          tsMs(s, dir), col("event_id"), col("event_type"))
        .orderBy(col("cnt").desc, col("path"))),
    "q_retention" -> ((s, dir) =>
      // day-cohort retention: users grouped by first-event day, counted
      // active again N days later (offset 0 = cohort size)
      graft.ops.Retention.retention(t(s, dir, "events"), "user_id", tsCol(s, dir))
        .orderBy("cohort_ms", "day_offset")),
    "q_retention_weekly" -> ((s, dir) =>
      // the same cohort shape at week granularity (both engines
      // truncate to ISO Monday) — the unit/periodSeconds parameters
      // exercised beyond their defaults
      graft.ops.Retention.retention(t(s, dir, "events"), "user_id", tsCol(s, dir),
          unit = "week", periodSeconds = 604800L)
        .withColumnRenamed("day_offset", "week_offset")
        .orderBy("cohort_ms", "week_offset")),
    "q_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(t(s, dir, "events"),
        Seq("event_id", "event_type", "user_id", "value"))),
    "q_profile_approx" -> ((s, dir) =>
      // the HLL census twin: one pass, no per-column Expand; exact
      // n/n_nulls, ~2% rsd on n_distinct (estimator row, OpsSpec
      // tolerance — HLL++ registers are not SQL-replayable)
      graft.ops.Profile.profileApprox(t(s, dir, "events"),
        Seq("event_id", "event_type", "user_id", "value"))),
    "q_resample" -> ((s, dir) =>
      graft.ops.TimeSeries.resampleLocf(t(s, dir, "events"), "user_id", tsCol(s, dir), col("value"))
        .select(col("user_id"), unix_millis(col("bucket")).as("hour_ms"),
          round(col("v"), 4).as("v"))
        .orderBy("user_id", "hour_ms")),
    "q_rolling_zscore" -> ((s, dir) =>
      // trailing-window anomaly gate: each event scored against its
      // user's previous <=10 values (self excluded), flagged at 2.5 sigma
      graft.ops.TimeSeries.rollingZscore(
          t(s, dir, "events"), "user_id", col("event_id"), col("value"))
        .orderBy("user_id", "seq")),
    "q_ewma" -> ((s, dir) =>
      // truncated exponential smoothing per user: geometric weights over
      // the trailing 10 observations, normalized by realized weight mass
      graft.ops.TimeSeries.ewma(
          t(s, dir, "events"), "user_id", col("event_id"), col("value"))
        .orderBy("user_id", "seq")),
    "q_outliers" -> ((s, dir) =>
      // robust per-type outliers: median/MAD z-score, exact grouped
      // percentiles over bounded-cardinality groups
      graft.ops.Profile.outliers(
          t(s, dir, "events").select("event_type", "value"),
          groupCol = "event_type", valueCol = "value", k = 3.5)
        .orderBy("event_type", "value")),
    "q_regression" -> ((s, dir) =>
      // per-type linear trend from one pass of stable moment aggregates
      graft.ops.TimeSeries.trendRegression(
          t(s, dir, "events"), "event_type", tsSec(s, dir), col("value"))
        .orderBy("event_type")),
    "q_winsorize" -> ((s, dir) =>
      // tail clipping into the per-type exact [p05, p95] band
      graft.ops.Profile.winsorize(
          t(s, dir, "events").select("event_type", "value"), "event_type", "value")
        .orderBy("event_type", "value")),
    "q_outliers_approx" -> ((s, dir) =>
      // the sketch twin of q_outliers (GK approx_percentile state, the
      // 1e9-row-hot-group form); estimator row — no oracle (the GK
      // value pick is not SQL-replayable), tolerance pinned in OpsSpec
      graft.ops.Profile.outliersApprox(
          t(s, dir, "events").select("event_type", "value"),
          groupCol = "event_type", valueCol = "value", k = 3.5)
        .orderBy("event_type", "value")),
    "q_winsorize_approx" -> ((s, dir) =>
      // sketch twin of q_winsorize, same estimator convention
      graft.ops.Profile.winsorizeApprox(
          t(s, dir, "events").select("event_type", "value"), "event_type", "value")
        .orderBy("event_type", "value")),
  )

  def oracles: Map[String, String] = Map(
    "q_funnel_counts" ->
      ("WITH v AS (SELECT user_id, min(event_id) AS s_view FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(event_id) AS s_click FROM events e JOIN v ON e.user_id = v.user_id AND e.event_id > v.s_view WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(event_id) AS s_purchase FROM events e JOIN c ON e.user_id = c.user_id AND e.event_id > c.s_click WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT count(*) AS n_view, (SELECT count(*) FROM c) AS n_click, (SELECT count(*) FROM p) AS n_purchase FROM v"),
    "q_retention_weekly" ->
      ("WITH p AS (SELECT user_id, CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS p_s FROM events), " +
        "f AS (SELECT user_id, min(p_s) AS cohort_s FROM p GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, p_s FROM p) " +
        "SELECT cohort_s * 1000 AS cohort_ms, (p_s - cohort_s) // 604800 AS week_offset, count(*) AS n_active " +
        "FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY cohort_ms, week_offset"),
    "q_type_affinity" ->
      // identical left-associated arithmetic from exact integer counts;
      // floor + 1e-9 nudge is the domain-mix convention
      ("WITH b AS (SELECT DISTINCT user_id, event_type FROM events), " +
        "u AS (SELECT count(DISTINCT user_id)::DOUBLE AS u FROM events), " +
        "per AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1), " +
        "pr AS (SELECT a.event_type AS type_a, bb.event_type AS type_b, count(*) AS n_xy FROM b a JOIN b bb ON a.user_id = bb.user_id AND a.event_type < bb.event_type GROUP BY 1, 2) " +
        "SELECT type_a, type_b, n_xy, " +
        "CAST(floor(n_xy * 1000000.0 / (SELECT u FROM u) + 1e-9) AS BIGINT) AS support_ppm, " +
        "CAST(floor(n_xy * (SELECT u FROM u) * 1000000.0 / (pa.n * pb.n) + 1e-9) AS BIGINT) AS lift_ppm " +
        "FROM pr JOIN per pa ON pa.event_type = type_a JOIN per pb ON pb.event_type = type_b " +
        "ORDER BY type_a, type_b"),
    "q_event_paths" ->
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id AS seq, event_type AS et FROM events), " +
        "s AS (SELECT user_id, ms, seq, et, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w >= 600000 THEN 1 ELSE 0 END AS new_s FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, seq)), " +
        "g AS (SELECT user_id, ms, seq, et, sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, seq ROWS UNBOUNDED PRECEDING) AS sid FROM s), " +
        "p AS (SELECT user_id, sid, list(et ORDER BY ms, seq) AS tl FROM g GROUP BY 1, 2), " +
        "ng AS (SELECT unnest(list_transform(generate_series(1, len(tl) - 2), i -> tl[i] || '>' || tl[i+1] || '>' || tl[i+2])) AS path FROM p WHERE len(tl) >= 3) " +
        "SELECT path, count(*) AS cnt FROM ng GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20"),
    "q_retention" ->
      ("WITH p AS (SELECT user_id, CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS p_s FROM events), " +
        "f AS (SELECT user_id, min(p_s) AS cohort_s FROM p GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, p_s FROM p) " +
        "SELECT cohort_s * 1000 AS cohort_ms, (p_s - cohort_s) // 86400 AS day_offset, count(*) AS n_active " +
        "FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY cohort_ms, day_offset"),
    "q_funnel_total_window" ->
      // every stage gated on the distance to the CHOSEN stage-1 ts
      // (carried from v into both chain steps), greedy by seq
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events), " +
        "v AS (SELECT user_id, min(event_id) AS s_view, arg_min(ms, event_id) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.event_id) AS s_click FROM e JOIN v ON e.user_id = v.user_id AND e.event_id > v.s_view AND e.ms - v.t_view <= 172800000 WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.event_id) AS s_purchase FROM e JOIN c ON e.user_id = c.user_id AND e.event_id > c.s_click JOIN v ON v.user_id = e.user_id AND e.ms - v.t_view <= 172800000 WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT v.user_id, s_view, s_click, s_purchase, " +
        "CASE WHEN s_purchase IS NOT NULL THEN 3 WHEN s_click IS NOT NULL THEN 2 ELSE 1 END AS stage " +
        "FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id) ORDER BY user_id"),
    "q_funnel_counts_windowed" ->
      // the gap-gated chain (q_funnel_windowed), reduced to counts
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events), " +
        "v AS (SELECT user_id, min(event_id) AS s_view, arg_min(ms, event_id) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.event_id) AS s_click, arg_min(e.ms, e.event_id) AS t_click FROM e JOIN v ON e.user_id = v.user_id AND e.event_id > v.s_view AND e.ms - v.t_view <= 86400000 WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.event_id) AS s_purchase FROM e JOIN c ON e.user_id = c.user_id AND e.event_id > c.s_click AND e.ms - c.t_click <= 86400000 WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT count(*) AS n_view, (SELECT count(*) FROM c) AS n_click, (SELECT count(*) FROM p) AS n_purchase FROM v"),
    "q_funnel_windowed" ->
      // greedy gap-gated chain: each stage CTE carries the CHOSEN
      // event's ts (arg_min by seq) so the next stage's join predicate
      // can bound the gap — mirrors min_by(ts, seq) on the Spark side
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events), " +
        "v AS (SELECT user_id, min(event_id) AS s_view, arg_min(ms, event_id) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.event_id) AS s_click, arg_min(e.ms, e.event_id) AS t_click FROM e JOIN v ON e.user_id = v.user_id AND e.event_id > v.s_view AND e.ms - v.t_view <= 86400000 WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.event_id) AS s_purchase FROM e JOIN c ON e.user_id = c.user_id AND e.event_id > c.s_click AND e.ms - c.t_click <= 86400000 WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT v.user_id, s_view, s_click, s_purchase, " +
        "CASE WHEN s_purchase IS NOT NULL THEN 3 WHEN s_click IS NOT NULL THEN 2 ELSE 1 END AS stage " +
        "FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id) ORDER BY user_id"),
    "q_funnel" ->
      // the same per-stage derivation: first view, first click AFTER it,
      // first purchase after that; stage = depth reached
      ("WITH v AS (SELECT user_id, min(event_id) AS s_view FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(event_id) AS s_click FROM events e JOIN v ON e.user_id = v.user_id AND e.event_id > v.s_view WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(event_id) AS s_purchase FROM events e JOIN c ON e.user_id = c.user_id AND e.event_id > c.s_click WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT v.user_id, s_view, s_click, s_purchase, " +
        "CASE WHEN s_purchase IS NOT NULL THEN 3 WHEN s_click IS NOT NULL THEN 2 ELSE 1 END AS stage " +
        "FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id) ORDER BY user_id"),
    "q_rolling_zscore" ->
      // sum_base, not mean_base: the fixture's 2-decimal values make
      // window MEANS land exactly on 4-decimal half-way points where
      // the engines' rounding rules diverge (FIXTURES.md "Rounding
      // boundaries"); sums stay 2-decimal-exact
      ("WITH s AS (SELECT user_id, event_id AS seq, value AS x, " +
        "count(value) OVER w AS n_base, avg(value) OVER w AS mean_base, stddev_pop(value) OVER w AS sd_base " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, seq, x AS value, round(mean_base * n_base, 4) AS sum_base, round(sd_base, 4) AS sd_base, n_base, " +
        "CASE WHEN sd_base > 0 THEN round((x - mean_base) / sd_base, 4) END AS zscore " +
        "FROM s WHERE n_base >= 5 AND abs(x - mean_base) >= 2.5 * sd_base AND abs(x - mean_base) > 0 ORDER BY user_id, seq"),
    "q_ewma" ->
      // identical frame, identical 0-based age exponents, identical
      // left-to-right folds — pow ulp jitter lands far inside round(,4)
      ("SELECT user_id, seq, round(" +
        "list_sum(list_transform(generate_series(1, len(vals)), i -> vals[i] * pow(0.8, len(vals) - i))) / " +
        "list_sum(list_transform(generate_series(1, len(vals)), i -> pow(0.8, len(vals) - i))), 4) AS ewma " +
        "FROM (SELECT user_id, event_id AS seq, list(value) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals FROM events) " +
        "ORDER BY user_id, seq"),
    "q_profile" ->
      ("SELECT * FROM (" +
        "SELECT 'event_id' AS column_name, count(*) AS n, count(*) - count(event_id) AS n_nulls, count(DISTINCT event_id) AS n_distinct FROM events " +
        "UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type), count(DISTINCT event_type) FROM events " +
        "UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id) FROM events " +
        "UNION ALL SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value) FROM events" +
        ") ORDER BY column_name"),
    "q_resample" ->
      ("WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value FROM events), " +
        "o AS (SELECT user_id, h, avg(value) AS v FROM e GROUP BY user_id, h), " +
        "b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM o GROUP BY user_id), " +
        "g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b), " +
        "j AS (SELECT g.user_id, g.h, o.v FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.h = o.h), " +
        "f AS (SELECT user_id, h, last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS v FROM j) " +
        "SELECT user_id, epoch_ms(h) AS hour_ms, round(v, 4) AS v FROM f ORDER BY user_id, hour_ms"),
    "q_outliers" ->
      ("WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m FROM events GROUP BY 1), " +
        "mad AS (SELECT e.event_type, quantile_cont(abs(value - m), 0.5) AS md FROM events e JOIN med USING (event_type) GROUP BY 1) " +
        "SELECT event_type, value, round(m, 4) AS med, round(md, 4) AS mad, round((value - m) / (1.4826 * md), 4) AS robust_z " +
        "FROM events e JOIN med USING (event_type) JOIN mad USING (event_type) " +
        "WHERE md > 0 AND abs((value - m) / (1.4826 * md)) > 3.5 ORDER BY event_type, value"),
    "q_regression" ->
      ("WITH d AS (SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) - 1700000000) / 3600.0 AS x, value AS y FROM events) " +
        "SELECT event_type, count(*) AS n, round(covar_pop(x, y) / var_pop(x), 4) AS slope_per_hour, " +
        "round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 4) AS intercept, " +
        "CASE WHEN var_pop(y) > 0 THEN round(covar_pop(x, y) * covar_pop(x, y) / (var_pop(x) * var_pop(y)), 4) END AS r2 " +
        "FROM d GROUP BY event_type HAVING var_pop(x) > 0 ORDER BY event_type"),
    "q_winsorize" ->
      ("WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS p_lo, quantile_cont(value, 0.95) AS p_hi FROM events GROUP BY 1) " +
        "SELECT event_type, value, round(p_lo, 4) AS p_lo, round(p_hi, 4) AS p_hi, " +
        "round(least(greatest(value, p_lo), p_hi), 4) AS clipped " +
        "FROM events JOIN b USING (event_type) ORDER BY event_type, value"),
  )
}
