package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Navigation-path mining over the event log: sessionize each key's
  * events by inactivity gap, slide an n-gram window over every
  * session's time-ordered event types, and count the most common
  * paths — "what do users DO, in order" ([[Funnel]] asks about one
  * fixed order; this discovers the orders).
  *
  * Sessionization is the explicit lag + running-sum form (the exact
  * arithmetic `q_session_window`'s oracle replays) with (ms, seq) as
  * the total order, so ties in the millisecond clock break on the
  * log's own seq and the result is deterministic.
  *
  * Shape: one keyed window pass (hash exchange on the key), one
  * (key, session) aggregate whose collected list is bounded by session
  * length, a narrow n-gram explode of 8-byte-ish path strings, and a
  * count + `TakeOrderedAndProject` top-k. Nothing collects a key's
  * full history — only per-session runs — and the path-count shuffle
  * carries (path, partial count) pairs. */
object Paths {

  def topPaths(
      events: DataFrame,
      key: String,
      ms: Column,
      seq: Column,
      typeCol: Column,
      gapMs: Long = 600000L,
      n: Int = 3,
      k: Int = 20): DataFrame = {
    require(n >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy(key).orderBy("ms", "seq")
    val run = Window.partitionBy(key).orderBy("ms", "seq")
      .rowsBetween(Window.unboundedPreceding, 0)
    val sess = events
      .select(col(key), ms.as("ms"), seq.as("seq"), typeCol.as("et"))
      .withColumn("new_s",
        when(lag("ms", 1).over(w).isNull ||
          col("ms") - lag("ms", 1).over(w) >= gapMs, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(run))
    val perSession = sess.groupBy(col(key), col("sid"))
      .agg(sort_array(collect_list(struct(col("ms"), col("seq"), col("et")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("et")).as("tl"))
    val grams = perSession.select(explode(
      when(size(col("tl")) >= n,
        transform(sequence(lit(0), size(col("tl")) - n),
          i => concat_ws(">", slice(col("tl"), i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("path"))
    grams.groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }
}
