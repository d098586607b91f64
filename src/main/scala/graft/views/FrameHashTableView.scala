package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, streaming-maintainable per-frame video-hash table — the
  * video twin of [[PhashTableView]], completing the modality ladder's
  * last rung (one-shot → stored → incremental): media rows append to
  * the log, each absorbed batch lands its `(media_id, frame_idx,
  * phash)` rows ([[graft.ops.Multimodal.videoFrameHashes]] — each
  * frame dHashed ONCE, at ingest) as a batch-atomic parquet delta, and
  * every new video batch near-dup checks against the whole stored
  * corpus via [[graft.ops.Multimodal.videoNearDupIncremental]] —
  * recurring cost ∝ batch, never corpus.
  *
  * Frame indexes are load-bearing (the frame-aligned match and the
  * full-frame-count gate need them), so deltas union raw and
  * compaction rewrites without a fold. Storage is the shared
  * [[DeltaProtocol]] with [[CompactableDeltas]]; slots under
  * [[graft.streaming.StreamingViewRunner]] with exactly-once recovery
  * like every other durable view. ~8 bytes per frame stays hot while
  * the video bytes stay cold. */
final class FrameHashTableView(
    protected val spark: SparkSession,
    protected val dir: String,
    protected val protocolVersion: Int,
    hashW: Int = 8,
    hashH: Int = 8,
    compactEvery: Int = 0) extends FlumeView with FeatureTableDeltas {

  override protected def autoCompactEvery: Int = compactEvery

  openProtocol()

  /** Absorb a media batch: decode + per-frame dHash here, land the
    * `(media_id, frame_idx, phash)` delta. */
  def absorb(entries: DataFrame, upto: Long): Unit =
    absorbHashes(graft.ops.Multimodal.videoFrameHashes(entries, hashW, hashH), upto)

  def absorbHashes(hashes: DataFrame, upto: Long): Unit = {
    hashes.select("media_id", "frame_idx", "phash")
      .write.mode("overwrite").parquet(batchPath(upto).toString)
    sinceSeq = upto
    writeManifest()
    maybeCompact()
  }

  /** The accumulated per-frame hash table. */
  def hashes: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    require(dirs.nonEmpty, "frame-hash table empty — absorb a batch first")
    spark.read.parquet(dirs: _*)
  }

  /** Corpus-SELF containment sweep over the stored table: every
    * shorter stored video that is a frame-run re-cut of any longer one
    * ([[graft.ops.Multimodal.videoContainmentSweep]] — the reupload
    * sweep, over frame hashes computed once at ingest). */
  def containmentSweep(maxHamming: Int = 7, maxBucket: Int = 256): DataFrame =
    graft.ops.Multimodal.videoContainmentSweep(hashes, maxHamming, maxBucket)

  /** Near-dup check of a new video batch against the stored corpus;
    * `dedupBatchHashes` when the batch's frame hashes are precomputed. */
  def dedupBatch(media: DataFrame, maxHamming: Int = 7, maxBucket: Int = 256): DataFrame =
    dedupBatchHashes(graft.ops.Multimodal.videoFrameHashes(media, hashW, hashH),
      maxHamming, maxBucket)

  def dedupBatchHashes(newHashes: DataFrame, maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    graft.ops.Multimodal.videoNearDupIncremental(
      newHashes, hashes, maxHamming, maxBucket)

  override def frameOption: Option[DataFrame] =
    if (committedBatchDirs().isEmpty) None else Some(hashes)
}

object FrameHashTableView {
  def apply(dir: String, hashW: Int = 8, hashH: Int = 8,
      version: Int = 1, compactEvery: Int = 0): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new FrameHashTableView(db.log.spark, s"$dir/$name", v, hashW, hashH, compactEvery)
    }
  }
}
