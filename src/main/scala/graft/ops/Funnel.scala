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
    * they are the complement of the stage-1 scan). */
  def funnel(
      events: DataFrame,
      key: String,
      seqCol: Column,
      typeCol: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.where(typeCol === stages.head)
      .groupBy(col(key)).agg(min(seqCol).as(s"s_${stages.head}"))
    val full = stages.zipWithIndex.tail.foldLeft(first) { case (acc, (st, i)) =>
      val prevCol = s"s_${stages(i - 1)}"
      val nxt = events.where(typeCol === st)
        .select(col(key), seqCol.as("__seq"))
        .join(acc.select(col(key), col(prevCol)), Seq(key))
        .where(col("__seq") > col(prevCol))
        .groupBy(col(key)).agg(min(col("__seq")).as(s"s_$st"))
      acc.join(nxt.select(col(key), col(s"s_$st")), Seq(key), "left")
    }
    // forward fold so the DEEPEST non-null stage ends up outermost
    val stageExpr = stages.zipWithIndex.foldLeft(lit(0)) { case (e, (st, i)) =>
      when(col(s"s_$st").isNotNull, lit(i + 1)).otherwise(e)
    }
    full.withColumn("stage", stageExpr)
  }

  /** The funnel summary: how many keys reached AT LEAST each stage. */
  def funnelCounts(
      events: DataFrame,
      key: String,
      seqCol: Column,
      typeCol: Column,
      stages: Seq[String]): DataFrame = {
    val f = funnel(events, key, seqCol, typeCol, stages)
    val reached = stages.zipWithIndex.map { case (st, i) =>
      sum(when(col("stage") >= i + 1, 1L).otherwise(0L)).as(s"n_$st")
    }
    f.agg(reached.head, reached.tail: _*)
  }
}
