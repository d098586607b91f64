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
}
