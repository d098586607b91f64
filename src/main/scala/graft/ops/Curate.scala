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
    * every near-pair at `nearThreshold` estimated Jaccard) → optional
    * containment dedup (`containmentThreshold`: drop the CONTAINED
    * side — the quote/subset, the doc with fewer shingles; ties drop
    * the higher id — of every pair MinHash is structurally blind to).
    *
    * The containment stage's df cap defaults to the PERCENTILE form
    * (`maxDocFreqPercentile`, p99): the round-13/14 scale probes showed
    * candidate volume is Σ df² and an absolute cap only works when the
    * operator already knows its boilerplate scale — a cap at a fixed
    * quantile of the corpus's OWN df distribution bounds the posting
    * quadratic by budget at any corpus size (a shingle in more
    * documents than 99% of all shingles is boilerplate by definition).
    * This is the probe's operating rule running as the operational
    * default, not just as a benchmark flag.
    *
    * The text is read ONCE for features: quality score, content hash and
    * hashed shingles are computed in a single fused pass into a cached
    * per-doc feature table (8 bytes + shingle hashes per doc — the text
    * itself is NOT cached), and every stage filters/joins on that table
    * (the containment stage reuses the SAME shingle sets —
    * [[Dedup.containmentFromShingles]], zero reshingling). The final
    * semi-join re-reads the source for the surviving text — at 100 TB,
    * two columnar scans beat staging the corpus in cache. */
  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.2,
      nearThreshold: Double = 0.6,
      verifyExact: Boolean = false,
      bands: Int = 16,
      maxBucket: Int = 64,
      containmentThreshold: Option[Double] = None,
      maxDocFreqPercentile: Double = 0.99): DataFrame = {
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
    val afterNear = exactKept.select("doc_id").join(nearDrop, Seq("doc_id"), "left_anti")

    // containment dedup on the near-dedup survivors: quotes/subsets
    // have Jaccard ≈ |quote|/|doc| ≈ 0, so LSH never sees them; the
    // inverted-index pass does, under the percentile df budget
    val afterContain = containmentThreshold.fold(afterNear) { t =>
      val survSh = feats.join(afterNear, Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("id"), col("hs").as("sh"))
      val pairs = Dedup.containmentFromShingles(survSh, threshold = t,
        maxDocFreqPercentile = Some(maxDocFreqPercentile))
      val sizes = feats.select(col("doc_id"), size(col("hs")).as("n"))
      val containDrop = pairs
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
        .select(when(col("n_a") < col("n_b"), col("id_a"))
          .when(col("n_b") < col("n_a"), col("id_b"))
          .otherwise(greatest(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
      afterNear.join(containDrop, Seq("doc_id"), "left_anti")
    }

    // surviving ids are small — checkpoint them, release the feature
    // cache, and hand back a clean lazy semi-join against the source
    val keptIds = afterContain.localCheckpoint(true)
    feats.unpersist(blocking = false)
    base.join(keptIds, Seq("doc_id"), "left_semi")
  }
}
