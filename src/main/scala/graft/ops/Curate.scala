package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition of the text and
  * dedup families into the pipeline a 100 TB pretraining-data run
  * actually executes — cheap per-row filters first (narrow, pushed to
  * the scan), exact dedup next (one hash aggregate), near-dedup last
  * (LSH candidates only on survivors). Ordering matters: each stage
  * shrinks the input of the more expensive stage after it.
  */
object Curate {

  /** Returns the curated (doc_id, text) set.
    *
    * Stages: quality floor → exact dedup (keep lowest doc_id per
    * identical content) → MinHash near-dedup (drop the higher id of
    * every near-pair at `nearThreshold` estimated Jaccard).
    */
  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.2,
      nearThreshold: Double = 0.6,
      verifyExact: Boolean = false): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    val q = TextAnalysis.qualityScore(base)
    val qualified = base.join(q.where(col("quality") >= minQuality).select("doc_id"), Seq("doc_id"), "left_semi")

    val exactKeep = Dedup.exact(qualified).select(col("keep_id").as("doc_id"))
    val exactKept = qualified.join(exactKeep, Seq("doc_id"), "left_semi")

    val nearPairs = Dedup.minhashLsh(exactKept, threshold = nearThreshold, verifyExact = verifyExact)
    val nearDrop = nearPairs.select(col("id_b").as("doc_id")).distinct()
    exactKept.join(nearDrop, Seq("doc_id"), "left_anti")
  }
}
