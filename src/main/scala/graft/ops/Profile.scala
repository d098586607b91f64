package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: the SUMMARIZE-style census (per-column row, null,
  * and distinct counts) every ingestion pipeline runs before trusting a
  * new drop. ONE aggregation pass over the table produces a single row
  * (count + countDistinct per column), melted to long form with
  * `stack` — a narrow driver-free reshape of one row.
  *
  * Scale note: exact multi-column countDistinct plans one Expand
  * replica of the scan per column. For a profiling pass over a handful
  * of columns that is the right trade (exact answers, one job); at
  * extreme width or size, swap `approx_count_distinct` — same plan
  * minus the Expand (HLL sketches merge map-side).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', n_rows, n_rows - cnt_$c, nd_$c").mkString(", ")
    one.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n, n_nulls, n_distinct)"))
      .orderBy("column_name")
  }

  /** Robust per-group outlier detection: flag rows whose value sits more
    * than `k` scaled MADs from the group median (the classic
    * median/MAD robust z-score — unlike mean/stdev it does not let the
    * outliers inflate their own yardstick). MAD is scaled by 1.4826
    * (consistency constant for the normal distribution).
    *
    * Plan: two grouped EXACT `percentile` aggregates (group medians,
    * then MAD = median of |v − med|), broadcast back as group-level
    * tables, then a narrow filter — the corpus is scanned twice, rows
    * shuffle only into per-group percentile state. Exact percentile
    * buffers each GROUP's values — right for bounded-cardinality group
    * keys (event types, sources); at hyperscale swap
    * `approx_percentile` (sketch state, same plan shape). */
  def outliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.5): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5D)").as("med"))
    val mad = df.join(med, groupCol)
      .groupBy(groupCol)
      .agg(expr(s"percentile(abs($valueCol - med), 0.5D)").as("mad"))
    df.join(broadcast(med), groupCol).join(broadcast(mad), groupCol)
      .withColumn("rz", (col(valueCol) - col("med")) / (lit(1.4826) * col("mad")))
      // mad = 0 (constant or majority-constant group) means the robust
      // scale is undefined — no finite z, so no flags (and no NaN/Inf
      // rows whose comparison semantics differ across engines)
      .where(col("mad") > 0 && abs(col("rz")) > k)
      .select(col(groupCol), col(valueCol),
        round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"),
        round(col("rz"), 4).as("robust_z"))
  }

  /** Per-group winsorization: clip `valueCol` into the group's
    * [`lo`, `hi`] exact percentile band — the standard tail-taming
    * transform before means/regressions on heavy-tailed metrics
    * (winsorized mean resists outliers without dropping rows the way
    * [[outliers]]-then-filter does). One grouped percentile aggregate
    * (two quantiles in one pass) broadcasts back as a group-level
    * table; the clip itself is a narrow projection. Same exact-vs-
    * approx percentile trade as [[outliers]]. */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got $lo/$hi")
    val bounds = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, ${lo}D)").as("p_lo"),
        expr(s"percentile($valueCol, ${hi}D)").as("p_hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped", least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
      .select(col(groupCol), col(valueCol),
        round(col("p_lo"), 4).as("p_lo"),
        round(col("p_hi"), 4).as("p_hi"),
        round(col("clipped"), 4).as("clipped"))
  }

  /** [[profile]] on `approx_count_distinct` (HyperLogLog++) — the
    * scale form the exact twin's Scaladoc names: exact multi-column
    * countDistinct plans one Expand replica of the scan PER COLUMN,
    * so a 50-column census reads the table 50×; HLL sketches merge
    * map-side in a single pass with no Expand at all. Row and null
    * counts stay exact (they share the same aggregate); only
    * `n_distinct` is estimated, with standard error `rsd` (default
    * 2 %). Estimator convention: rows-only gate + OpsSpec tolerance
    * (HLL++ register layout is not SQL-replayable). */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      approx_count_distinct(col(c), rsd).as(s"nd_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', n_rows, n_rows - cnt_$c, nd_$c").mkString(", ")
    one.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n, n_nulls, n_distinct)"))
      .orderBy("column_name")
  }

  /** [[outliers]] on `approx_percentile` sketches — the form that
    * survives a hot group with 10⁹ rows. Exact grouped `percentile`
    * buffers every group value in the aggregation state; the
    * Greenwald–Khanna sketch holds O(accuracy · log n) entries and
    * merges map-side, so a single skewed group no longer means one
    * executor materializing the whole group.
    *
    * Error bound: each returned quantile is an ACTUAL group value whose
    * rank is within `n / accuracy` of the target rank (GK guarantee) —
    * at the default 10⁴ that is ±0.01 % of the group in rank space.
    * The med/mad/robust_z outputs inherit that rank tolerance, so a
    * row within it of the `k`-sigma boundary may flag differently than
    * [[outliers]] — estimator convention: rows-only gate + ProfileSpec
    * tolerance checks, no DuckDB oracle (GK pick is not replayable). */
  def outliersApprox(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.5,
      accuracy: Int = 10000): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"approx_percentile($valueCol, 0.5D, $accuracy)").as("med"))
    val mad = df.join(broadcast(med), groupCol)
      .groupBy(groupCol)
      .agg(expr(s"approx_percentile(abs($valueCol - med), 0.5D, $accuracy)").as("mad"))
    df.join(broadcast(med), groupCol).join(broadcast(mad), groupCol)
      .withColumn("rz", (col(valueCol) - col("med")) / (lit(1.4826) * col("mad")))
      .where(col("mad") > 0 && abs(col("rz")) > k)
      .select(col(groupCol), col(valueCol),
        round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"),
        round(col("rz"), 4).as("robust_z"))
  }

  /** [[winsorize]] on `approx_percentile` — both band quantiles from
    * one sketch pass (same state, two queries). Same GK rank-error
    * contract as [[outliersApprox]]: clip bounds are actual group
    * values within `n / accuracy` ranks of the exact band, so clipped
    * values differ from the exact twin only for rows inside that rank
    * tolerance of either bound. Estimator convention (rows-only +
    * ProfileSpec), like every sketch-backed operator here. */
  def winsorizeApprox(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double = 0.05,
      hi: Double = 0.95,
      accuracy: Int = 10000): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got $lo/$hi")
    val bounds = df.groupBy(groupCol)
      .agg(expr(s"approx_percentile($valueCol, array(${lo}D, ${hi}D), $accuracy)").as("b"))
      .select(col(groupCol), col("b").getItem(0).as("p_lo"), col("b").getItem(1).as("p_hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped", least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
      .select(col(groupCol), col(valueCol),
        round(col("p_lo"), 4).as("p_lo"),
        round(col("p_hi"), 4).as("p_hi"),
        round(col("clipped"), 4).as("clipped"))
  }
}
