package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, streaming-maintainable audio-fingerprint table — the audio
  * rung of the multimodal dedup ladder (one-shot → stored table →
  * incremental), mirroring [[PhashTableView]]: media rows append to the
  * log, each absorbed batch lands its `(media_id, afp)` rows
  * ([[graft.ops.Multimodal.audioFingerprint]] — the windowed-energy
  * difference hash computed ONCE, at ingest) as a batch-atomic parquet
  * delta, and every new audio batch near-dup checks against the whole
  * stored corpus via
  * [[graft.ops.Multimodal.audioNearDupIncremental]] — recurring cost ∝
  * batch, never corpus.
  *
  * Storage is the shared [[DeltaProtocol]] (manifest after delta ⇒
  * crash-safe; orphan pruning at open; version bump ⇒ wipe and rebuild)
  * with [[CompactableDeltas]] bounding the small-files chain, so it
  * slots under [[graft.streaming.StreamingViewRunner]] with
  * exactly-once recovery like every other durable view. At cluster
  * scale this 8-bytes-per-recording table is the hot artifact an
  * ASR-ingest dedup keeps while the waveforms stay cold.
  */
final class AudioFingerprintTableView(
    protected val spark: SparkSession,
    protected val dir: String,
    protected val protocolVersion: Int,
    minWindowSamples: Int = 16,
    nBits: Int = 64,
    compactEvery: Int = 0) extends FlumeView with FeatureTableDeltas {

  override protected def autoCompactEvery: Int = compactEvery

  openProtocol()

  /** Absorb a media batch: decode + fingerprint here (each recording
    * hashed exactly once, at ingest), land the `(media_id, n_windows,
    * afp)` delta — the window count is stored beside the fingerprint
    * because [[graft.ops.Multimodal.audioNearDup]]'s length gate needs
    * it at dedup time without re-touching the waveform. */
  def absorb(entries: DataFrame, upto: Long): Unit =
    absorbFingerprints(
      graft.ops.Multimodal.audioFingerprint(entries, minWindowSamples, nBits), upto)

  /** Absorb a PRECOMPUTED `(media_id, n_windows, afp)` delta — for
    * callers that already paid the decode for their own dedup decision. */
  def absorbFingerprints(fps: DataFrame, upto: Long): Unit = {
    fps.select("media_id", "n_windows", "afp")
      .write.mode("overwrite").parquet(batchPath(upto).toString)
    sinceSeq = upto
    writeManifest()
    maybeCompact()
  }

  /** The accumulated `(media_id, n_windows, afp)` table — feed to
    * [[graft.ops.Multimodal.audioNearDupIncremental]]. */
  def fingerprints: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    require(dirs.nonEmpty, "fingerprint table empty — absorb a batch first")
    spark.read.parquet(dirs: _*)
  }

  /** Near-dup check of a new media batch against the stored corpus;
    * `dedupBatchFingerprints` when the batch's prints are precomputed. */
  def dedupBatch(media: DataFrame, maxHamming: Int = 7, maxBucket: Int = 256): DataFrame =
    dedupBatchFingerprints(
      graft.ops.Multimodal.audioFingerprint(media, minWindowSamples, nBits),
      maxHamming, maxBucket)

  def dedupBatchFingerprints(newFps: DataFrame, maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    graft.ops.Multimodal.audioNearDupIncremental(
      newFps, fingerprints, maxHamming, maxBucket)

  override def frameOption: Option[DataFrame] =
    if (committedBatchDirs().isEmpty) None else Some(fingerprints)
}

object AudioFingerprintTableView {
  // default version 2: v2 added the n_windows column (the near-dup
  // length gate) and duration-proportional fingerprint windows — a v1
  // table reopened under v2 wipes and rebuilds per the protocol rule
  def apply(dir: String, minWindowSamples: Int = 16, nBits: Int = 64,
      version: Int = 2, compactEvery: Int = 0): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new AudioFingerprintTableView(
          db.log.spark, s"$dir/$name", v, minWindowSamples, nBits, compactEvery)
    }
  }
}
