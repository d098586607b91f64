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
    *
    * The text is read ONCE for features: quality score, content hash and
    * hashed shingles are computed in a single fused pass into a cached
    * per-doc feature table (8 bytes + shingle hashes per doc — the text
    * itself is NOT cached), and every stage filters/joins on that table.
    * The final semi-join re-reads the source for the surviving text — at
    * 100 TB, two columnar scans beat staging the corpus in cache. */
  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.2,
      nearThreshold: Double = 0.6,
      verifyExact: Boolean = false,
      bands: Int = 16,
      maxBucket: Int = 64): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    val feats = base.select(
        col("doc_id"),
        TextAnalysis.qualityCol(col("text")).as("quality"),
        xxhash64(col("text")).as("content_hash"),
        Dedup.hashedShinglesCol(col("text")).as("hs"))
      .persist()

    val qualified = feats.where(col("quality") >= minQuality)

    // exact dedup: one hash-aggregate over the precomputed content hash
    val exactKeep = qualified.groupBy("content_hash").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactKept = qualified.join(exactKeep, Seq("doc_id"), "left_semi")

    // near-dedup on survivors, shingles reused from the feature table
    val nearPairs = Dedup.minhashLshFromShingles(
      exactKept.select(col("doc_id").as("id"), col("hs")).where(size(col("hs")) > 0),
      threshold = nearThreshold, verifyExact = verifyExact,
      bands = bands, maxBucket = maxBucket)
    val nearDrop = nearPairs.select(col("id_b").as("doc_id")).distinct()

    // surviving ids are small — checkpoint them, release the feature
    // cache, and hand back a clean lazy semi-join against the source
    val keptIds = exactKept.select("doc_id").join(nearDrop, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    feats.unpersist(blocking = false)
    base.join(keptIds, Seq("doc_id"), "left_semi")
  }
}
