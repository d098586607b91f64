package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end in doc order and chop the
  * token stream into fixed-`capacity` training sequences ("concat and
  * chunk" — the standard LLM pretraining packing scheme; a document may
  * straddle two sequences). Each document is labeled with the sequence
  * that contains its first token and its offset inside it, which is
  * exactly the global EXCLUSIVE prefix sum of token counts, divmod the
  * capacity.
  *
  * Scale shape: a naive `Window.orderBy(id)` cumulative sum collapses to
  * ONE partition — the whole corpus through a single task. This is
  * instead the classic two-phase distributed scan:
  *   1. deterministic range buckets on the id (origin/width from one
  *      tiny min/max agg — not `repartitionByRange`, whose sampled
  *      boundaries differ run to run);
  *   2. one row per bucket of partial sums -> exclusive prefix offsets,
  *      a P-row frame joined back by broadcast;
  *   3. the cumulative sum runs per-bucket (Window partitioned by
  *      bucket), so every task scans only its own bucket.
  * Wire cost: one shuffle of (id, n_tokens) pairs + a P-row broadcast.
  */
object Packing {

  def packSequences(
      docs: DataFrame,
      capacity: Long,
      nBuckets: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text",
      tokensOf: Column => Column = TextAnalysis.tokens,
      checkpointResult: Boolean = true): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(tokensOf(col(textCol))).cast("long").as("n_tokens"))

    val bounds = counted.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return counted.withColumn("seq_id", lit(0L)).withColumn("seq_offset", lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    // integer `div`, not double division: bucket ids stay exact past
    // 2^53 where a double quotient would round
    val bucketed = counted.withColumn("__b", expr(s"(doc_id - ${lo}L) div ${width}L"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Per-bucket token totals: P rows collected to the driver. The
    // collect doubles as the cache materialization, so the corpus is
    // scanned and tokenized exactly ONCE — the window pass below reads
    // the (id, n_tokens, b) cache, never the text again.
    val totals = bucketed.groupBy("__b").agg(sum("n_tokens").as("__bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offs = totals.scanLeft((0L, 0L)) { case ((_, acc), (b, s)) => (b, acc + s) }
    val offsets = totals.map(_._1).zip(offs.dropRight(1).map(_._2)).toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__b", "__off")

    val wIn = Window.partitionBy("__b").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = bucketed.join(broadcast(offDf), "__b")
      .withColumn("__cum", coalesce(sum("n_tokens").over(wIn), lit(0L)) + col("__off"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        expr(s"__cum div ${capacity}L").as("seq_id"),
        pmod(col("__cum"), lit(capacity)).as("seq_offset"))
    if (!checkpointResult) return out // lazy form (plan inspection); cache lives with the session
    // eager checkpoint of the (4-long-columns) result releases the
    // cached scan frame without handing the caller a DF that would
    // silently re-tokenize the corpus on every action
    val ck = out.localCheckpoint(true)
    bucketed.unpersist(blocking = false)
    ck
  }
}
