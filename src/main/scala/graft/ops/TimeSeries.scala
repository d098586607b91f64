package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular event stream onto a
  * fixed per-key grid, filling gaps by last observation carried forward
  * (LOCF) — the standard prep step before feature windows or joins that
  * assume aligned timestamps.
  *
  * Scale shape: one (key, bucket) aggregation; the grid is generated
  * per key from that key's OWN observed span (`sequence` + `explode`,
  * narrow); the carry-forward window partitions by key — never a global
  * window, never a driver loop. A key observed over D days contributes
  * D·24 grid rows regardless of its event count, so dense keys compress
  * and sparse keys interpolate.
  */
object TimeSeries {

  /** Per-key `truncUnit` grid with LOCF fill. `ts` must be a timestamp
    * column. Output: key, bucket (timestamp), v (mean of the bucket's
    * observations, carried forward across empty buckets). The grid
    * spans each key's own [min, max] observed bucket, so the first grid
    * row is always observed and LOCF is total.
    *
    * Carry-forward is the gap-run form, not generate-grid-then-join:
    * each observed bucket looks one row ahead (`lead`) and explodes its
    * own run [bucket, next − 1 step] carrying its value — one agg, one
    * keyed window, one narrow explode, versus the naive plan's second
    * agg + outer join + IGNORE NULLS window (measured 2.5× slower at
    * sf0.1). The oracle replays the naive plan, pinning equivalence. */
  def resampleLocf(
      df: DataFrame,
      key: String,
      ts: Column,
      value: Column,
      truncUnit: String = "hour"): DataFrame = {
    val step = expr(s"INTERVAL 1 $truncUnit")
    val observed = df.select(col(key), date_trunc(truncUnit, ts).as("bucket"), value.as("v"))
      .groupBy(key, "bucket").agg(avg("v").as("v"))
    val w = Window.partitionBy(key).orderBy("bucket")
    observed
      .withColumn("__next", lead("bucket", 1).over(w))
      .select(col(key),
        explode(sequence(col("bucket"),
          coalesce(col("__next") - step, col("bucket")), step)).as("bucket"),
        col("v"))
  }

  /** Per-key linear trend: ordinary least squares of `value` on time,
    * computed entirely from Spark's single-pass stable moment
    * aggregates (`covar_pop` / `var_pop` / `corr` — Welford-style
    * merges, the same shapes DuckDB implements, so the oracle replays
    * them exactly): slope = cov(x,y)/var(x), intercept = ȳ − slope·x̄,
    * r² = corr². One map-side-combined aggregation; no window, no
    * second scan, no driver math. `x` is HOURS since a fixed epoch so
    * slopes land in a numerically comfortable range (per-second slopes
    * round to zero; raw epoch seconds put 1e18-scale cancellation into
    * var_pop).
    *
    * Keys with a degenerate x-variance (a single observation, or all
    * observations in one instant) have no defined trend and are
    * dropped, mirroring the mad = 0 convention in
    * [[Profile.outliers]]. */
  def trendRegression(
      df: DataFrame,
      key: String,
      tsSecs: Column,
      value: Column): DataFrame = {
    val x = (tsSecs - lit(1700000000L)).cast("double") / 3600.0
    // r² as cov²/(vx·vy), not corr(): Spark's ANSI-mode corr raises
    // DIVIDE_BY_ZERO inside the aggregate when a group has var(y) = 0
    // (a constant series), where this form can guard with a CASE
    val out = df.select(col(key), x.as("x"), value.cast("double").as("y"))
      .groupBy(key)
      .agg(count(lit(1)).as("n"),
        covar_pop(col("x"), col("y")).as("cov"),
        var_pop(col("x")).as("vx"),
        var_pop(col("y")).as("vy"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"))
      .where(col("vx") > 0)
    out.select(col(key), col("n"),
      round(col("cov") / col("vx"), 4).as("slope_per_hour"),
      round(col("my") - (col("cov") / col("vx")) * col("mx"), 4).as("intercept"),
      when(col("vy") > 0,
        round(col("cov") * col("cov") / (col("vx") * col("vy")), 4)).as("r2"))
  }

  /** Truncated exponentially-weighted moving average: geometric weights
    * `decay^age` over the trailing `lookback` observations (self
    * included), normalized by the realized weight mass so early rows
    * with short histories are proper weighted means. The infinite-
    * history EWMA is a sequential recurrence no relational engine can
    * window; the truncated form is the windowed approximation with
    * relative error ≤ decay^lookback (≈ 0.11 at the defaults) and is
    * exactly replayable cross-engine — same reasoning as the
    * [[resampleLocf]] oracle replaying the naive plan.
    *
    * One keyed ROWS window; the frame's values are collected in frame
    * order (≤ lookback doubles) and folded with higher-order functions
    * — index-weighted products, left-to-right sums, no UDF. */
  def ewma(
      df: DataFrame,
      key: String,
      orderCol: Column,
      value: Column,
      lookback: Int = 10,
      decay: Double = 0.8): DataFrame = {
    val w = Window.partitionBy(key).orderBy("seq")
      .rowsBetween(-(lookback - 1).toLong, 0L)
    val vals = col("vals")
    val age = (i: Column) => (size(vals) - 1 - i).cast("double")
    val num = aggregate(
      transform(vals, (v, i) => v * pow(lit(decay), age(i))), lit(0.0), _ + _)
    val den = aggregate(
      transform(vals, (v, i) => pow(lit(decay), age(i))), lit(0.0), _ + _)
    df.select(col(key), orderCol.as("seq"), value.cast("double").as("x"))
      .withColumn("vals", collect_list("x").over(w))
      .select(col(key), col("seq"), round(num / den, 4).as("ewma"))
  }

  /** Per-key rolling z-score anomaly detection: each observation is
    * scored against the trailing `lookback` observations (EXCLUDING
    * itself — the score must not let the candidate pull its own
    * baseline), and flagged when `|x − mean| ≥ z · stddev`. The classic
    * streaming-telemetry outlier gate, as a batch operator.
    *
    * One keyed row-frame window — partitioned by `key`, so a
    * 1000-executor cluster scores every key independently with a single
    * hash partition exchange and no global sort. The frame is ROWS-based
    * (not RANGE), so the baseline is the last-N observations regardless
    * of event spacing; `minObs` suppresses scores until the baseline has
    * enough support (early rows of a key are unscored, not
    * zero-variance-flagged). Degenerate baselines (stddev = 0) flag any
    * deviation iff it is nonzero, via the cross-multiplied form
    * `|x − mean| ≥ z·sd` which needs no division and so has no
    * divide-by-zero edge.
    *
    * Output: one row per FLAGGED observation — key, seq, value, the
    * baseline (SUM + n, not the mean: per the FIXTURES.md rounding
    * convention, sums of fixed-decimal inputs never sit on a rounding
    * boundary where cross-engine half-way rules diverge; the mean is
    * sum/n to the consumer), sd, and the signed z (null when sd = 0,
    * mirroring [[Profile.outliers]]'s mad = 0 convention). */
  def rollingZscore(
      df: DataFrame,
      key: String,
      orderCol: Column,
      value: Column,
      lookback: Int = 10,
      minObs: Int = 5,
      z: Double = 2.5): DataFrame = {
    val w = Window.partitionBy(key).orderBy("seq")
      .rowsBetween(-lookback.toLong, -1L)
    val scored = df.select(col(key), orderCol.as("seq"), value.cast("double").as("x"))
      .withColumn("n_base", count(col("x")).over(w))
      .withColumn("mean_base", avg(col("x")).over(w))
      .withColumn("sd_base", stddev_pop(col("x")).over(w))
    scored
      .where(col("n_base") >= minObs &&
        abs(col("x") - col("mean_base")) >= lit(z) * col("sd_base") &&
        abs(col("x") - col("mean_base")) > 0) // sd = 0: only a NONZERO deviation flags
      .select(col(key), col("seq"), col("x").as("value"),
        round(col("mean_base") * col("n_base"), 4).as("sum_base"),
        round(col("sd_base"), 4).as("sd_base"),
        col("n_base"),
        when(col("sd_base") > 0,
          round((col("x") - col("mean_base")) / col("sd_base"), 4)).as("zscore"))
  }
}
