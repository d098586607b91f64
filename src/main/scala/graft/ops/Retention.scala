package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over the event log: group keys by the period of
  * their FIRST event (the cohort), then count how many of each cohort
  * are active again N periods later — the other classic event-log
  * analytics read next to [[Funnel]].
  *
  * Shape: one aggregate for first-seen (map-side combined min), one
  * distinct over (key, period) — the activity table, shuffling 16
  * bytes/row — and an equi-join on the key followed by the final
  * count aggregate. Nothing windows over the whole log and the
  * activity distinct is the only table-sized shuffle; at 10⁹ keys the
  * join is two hash-partitioned 8-byte-key tables. Offsets are exact
  * integer arithmetic on period-truncated epochs (UTC, so periods are
  * fixed-width). */
object Retention {

  /** One row per (cohort period, offset): `n_active` keys of that
    * cohort with ≥ 1 event exactly `offset` periods after their first.
    * Offset 0 is the cohort size (every key is active in its own first
    * period). `unit` is a `date_trunc` unit; `periodSeconds` must be
    * its fixed width (86400 for "day", 604800 for "week"). */
  def retention(
      events: DataFrame,
      key: String,
      ts: Column,
      unit: String = "day",
      periodSeconds: Long = 86400L): DataFrame = {
    val period = unix_seconds(date_trunc(unit, ts))
    val firsts = events.groupBy(col(key)).agg(min(period).as("cohort_s"))
    val active = events.select(col(key), period.as("p_s")).distinct()
    active.join(firsts, Seq(key))
      .groupBy(col("cohort_s"),
        ((col("p_s") - col("cohort_s")) / periodSeconds).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active")) // activity is pre-distinct per key
      .select((col("cohort_s") * 1000).as("cohort_ms"), col("day_offset"), col("n_active"))
  }
}
