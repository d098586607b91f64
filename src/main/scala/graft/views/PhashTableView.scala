package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, streaming-maintainable perceptual-hash table — the image
  * twin of [[SignatureTableView]], completing the multimodal dedup
  * ladder (one-shot → stored table → incremental): media rows append to
  * the log, each absorbed batch lands its `(media_id, phash)` rows
  * ([[graft.ops.Multimodal.perceptualHash]] — the dHash computed ONCE,
  * at ingest) as a batch-atomic parquet delta, and every new image
  * batch near-dup checks against the whole stored corpus via
  * [[graft.ops.Multimodal.perceptualNearDupIncremental]] — recurring
  * cost ∝ batch, never corpus.
  *
  * Storage is the shared [[DeltaProtocol]] (manifest after delta ⇒
  * crash-safe; orphan pruning at open; version bump ⇒ wipe and
  * rebuild) with [[CompactableDeltas]] bounding the small-files chain,
  * so it slots under [[graft.streaming.StreamingViewRunner]] with
  * exactly-once recovery like every other durable view here. At
  * cluster scale this 8-bytes-per-image table is the stored artifact
  * image dedup pipelines keep hot while the image bytes stay cold.
  */
final class PhashTableView(
    protected val spark: SparkSession,
    protected val dir: String,
    protected val protocolVersion: Int,
    hashW: Int = 8,
    hashH: Int = 8,
    compactEvery: Int = 0) extends FlumeView with FeatureTableDeltas {

  override protected def autoCompactEvery: Int = compactEvery

  openProtocol()

  /** Absorb a media batch: decode + dHash here (each image hashed
    * exactly once, at ingest), land the `(media_id, phash)` delta. */
  def absorb(entries: DataFrame, upto: Long): Unit =
    absorbHashes(graft.ops.Multimodal.perceptualHash(entries, hashW, hashH), upto)

  /** Absorb a PRECOMPUTED `(media_id, phash)` delta — for callers that
    * already paid the decode for their own dedup decision. */
  def absorbHashes(hashes: DataFrame, upto: Long): Unit = {
    hashes.select("media_id", "phash")
      .write.mode("overwrite").parquet(batchPath(upto).toString)
    sinceSeq = upto
    writeManifest()
    maybeCompact()
  }

  /** The accumulated `(media_id, phash)` table — feed to
    * [[graft.ops.Multimodal.perceptualNearDupIncremental]]. */
  def hashes: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    require(dirs.nonEmpty, "phash table empty — absorb a batch first")
    spark.read.parquet(dirs: _*)
  }

  /** Near-dup check of a new media batch against the stored corpus;
    * `dedupBatchHashes` when the batch's hashes are precomputed. */
  def dedupBatch(media: DataFrame, maxHamming: Int = 7, maxBucket: Int = 256): DataFrame =
    dedupBatchHashes(graft.ops.Multimodal.perceptualHash(media, hashW, hashH),
      maxHamming, maxBucket)

  def dedupBatchHashes(newHashes: DataFrame, maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    graft.ops.Multimodal.perceptualNearDupIncremental(
      newHashes, hashes, maxHamming, maxBucket)

  override def frameOption: Option[DataFrame] =
    if (committedBatchDirs().isEmpty) None else Some(hashes)
}

object PhashTableView {
  def apply(dir: String, hashW: Int = 8, hashH: Int = 8,
      version: Int = 1, compactEvery: Int = 0): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new PhashTableView(db.log.spark, s"$dir/$name", v, hashW, hashH, compactEvery)
    }
  }
}
