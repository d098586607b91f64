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
    * row is always observed and LOCF is total. */
  def resampleLocf(
      df: DataFrame,
      key: String,
      ts: Column,
      value: Column,
      truncUnit: String = "hour"): DataFrame = {
    val bucketed = df.select(col(key), date_trunc(truncUnit, ts).as("bucket"), value.as("v"))
    val observed = bucketed.groupBy(key, "bucket").agg(avg("v").as("v"))
    val grid = observed.groupBy(key)
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(key),
        explode(sequence(col("b0"), col("b1"), expr(s"INTERVAL 1 $truncUnit"))).as("bucket"))
    val w = Window.partitionBy(key).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(key, "bucket"), "left")
      .select(col(key), col("bucket"), last("v", ignoreNulls = true).over(w).as("v"))
  }
}
