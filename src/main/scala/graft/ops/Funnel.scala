package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for each key, the seq of
  * the first stage-1 event, the first stage-2 event strictly AFTER it,
  * the first stage-3 event after that, and so on — the "view → click →
  * purchase, in order" question every event-log store answers. Order is
  * judged by the log's own seq (flume's only ordering primitive), so the
  * funnel is exact even when wall-clock timestamps tie.
  *
  * Shape: one grouped aggregation per stage, each map-side combined and
  * shuffling only (key, seq) pairs; stage i joins the previous stage's
  * per-key threshold (an 8-byte column) back to the events of type i.
  * K stages = K small hash aggregates + K−1 equi-joins on the key — no
  * window over the whole log, no per-key event collection, so a
  * 100 TB log with 10⁹ keys funnels at the cost of K filtered scans
  * (each pruned to its stage's type by predicate pushdown).
  */
object Funnel {

  /** Per-key funnel: one row per key that reached stage ≥ 1, with one
    * nullable `s_<stage>` seq column per stage and `stage` = how deep
    * the key got (1-based; keys that never fired stage 1 are absent —
    * they are the complement of the stage-1 scan).
    *
    * Time-bounded form: with `tsCol` + `maxGap`, a stage-i event only
    * qualifies while its ts is within `maxGap` (same units as `tsCol`)
    * of the gap ANCHOR — per `gapFrom`: `"prev"` (default) anchors each
    * transition on the previous CHOSEN stage's ts ("purchase within N
    * hours of the click"); `"first"` anchors every stage on the chosen
    * stage-1 ts — a total conversion window ("complete the funnel
    * within N hours of the first view", ClickHouse `windowFunnel`'s
    * semantic). Stage choice stays GREEDY by seq — first qualifying
    * event after the previous stage's chosen one; the chosen event's
    * ts rides along as a `min_by(ts, seq)` in the same aggregate, so
    * the shape is still K map-side-combined aggregates + K−1
    * equi-joins on the key. */
  def funnel(
      events: DataFrame,
      key: String,
      seqCol: Column,
      typeCol: Column,
      stages: Seq[String],
      tsCol: Option[Column] = None,
      maxGap: Option[Long] = None,
      gapFrom: String = "prev"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // colliding s_<stage> columns would mis-resolve the prev-stage
    // reference in the fold (r7 ADVICE)
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    require(maxGap.isEmpty || tsCol.nonEmpty, "maxGap needs tsCol to measure gaps on")
    require(gapFrom == "prev" || gapFrom == "first", s"gapFrom must be prev|first, got $gapFrom")
    val gapped = maxGap.isDefined
    val ts = tsCol.getOrElse(lit(0L))
    def tAgg(st: String) = min_by(col("__ts"), col("__seq")).as(s"__t_$st")
    val first0 = events.where(typeCol === stages.head)
      .select(col(key), seqCol.as("__seq"), ts.as("__ts"))
      .groupBy(col(key))
    val first =
      if (gapped) first0.agg(min(col("__seq")).as(s"s_${stages.head}"), tAgg(stages.head))
      else first0.agg(min(col("__seq")).as(s"s_${stages.head}"))
    val full = stages.zipWithIndex.tail.foldLeft(first) { case (acc, (st, i)) =>
      val prevCol = s"s_${stages(i - 1)}"
      // gap anchor: the previous chosen stage's ts, or stage 1's for
      // the total-conversion-window form
      val anchorT = if (gapFrom == "first") s"__t_${stages.head}"
                    else s"__t_${stages(i - 1)}"
      val accSel = if (gapped) acc.select(col(key), col(prevCol), col(anchorT))
                   else acc.select(col(key), col(prevCol))
      val qualifies =
        if (gapped) col("__seq") > col(prevCol) && col("__ts") - col(anchorT) <= maxGap.get
        else col("__seq") > col(prevCol)
      val grouped = events.where(typeCol === st)
        .select(col(key), seqCol.as("__seq"), ts.as("__ts"))
        .join(accSel, Seq(key))
        .where(qualifies)
        .groupBy(col(key))
      val nxt = if (gapped) grouped.agg(min(col("__seq")).as(s"s_$st"), tAgg(st))
                else grouped.agg(min(col("__seq")).as(s"s_$st"))
      val nxtSel = if (gapped) nxt.select(col(key), col(s"s_$st"), col(s"__t_$st"))
                   else nxt.select(col(key), col(s"s_$st"))
      acc.join(nxtSel, Seq(key), "left")
    }
    // forward fold so the DEEPEST non-null stage ends up outermost
    val stageExpr = stages.zipWithIndex.foldLeft(lit(0)) { case (e, (st, i)) =>
      when(col(s"s_$st").isNotNull, lit(i + 1)).otherwise(e)
    }
    full.withColumn("stage", stageExpr)
      .drop(stages.map(st => s"__t_$st"): _*)
  }

  /** The funnel summary: how many keys reached AT LEAST each stage.
    * `tsCol`/`maxGap` pass through to [[funnel]] for the time-bounded
    * form. */
  def funnelCounts(
      events: DataFrame,
      key: String,
      seqCol: Column,
      typeCol: Column,
      stages: Seq[String],
      tsCol: Option[Column] = None,
      maxGap: Option[Long] = None): DataFrame = {
    val f = funnel(events, key, seqCol, typeCol, stages, tsCol, maxGap)
    val reached = stages.zipWithIndex.map { case (st, i) =>
      sum(when(col("stage") >= i + 1, 1L).otherwise(0L)).as(s"n_$st")
    }
    f.agg(reached.head, reached.tail: _*)
  }
}
