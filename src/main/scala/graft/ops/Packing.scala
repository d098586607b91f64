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
      tokensOf: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(tokensOf(col(textCol))).cast("long").as("n_tokens"))

    val bounds = counted.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return counted.withColumn("seq_id", lit(0L)).withColumn("seq_offset", lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val bucketed = counted.withColumn("__b", (col("doc_id") - lit(lo)) / lit(width))
      .withColumn("__b", col("__b").cast("long"))

    // exclusive prefix offset per bucket: sum of all earlier buckets'
    // token totals. P rows — window over P rows is fine.
    val perBucket = bucketed.groupBy("__b").agg(sum("n_tokens").as("__bsum"))
    val wB = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(
      col("__b"), coalesce(sum("__bsum").over(wB), lit(0L)).as("__off"))

    val wIn = Window.partitionBy("__b").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), "__b")
      .withColumn("__cum", coalesce(sum("n_tokens").over(wIn), lit(0L)) + col("__off"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("__cum") / lit(capacity)).cast("long").as("seq_id"),
        pmod(col("__cum"), lit(capacity)).as("seq_offset"))
  }
}
