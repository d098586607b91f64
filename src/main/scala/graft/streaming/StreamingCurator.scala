package graft.streaming

import graft.core.FlumeLog
import graft.views.SignatureTableView
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import java.nio.file.{Files, Paths}

/** Continuous corpus curation: the batch [[graft.ops.Curate]] pipeline as
  * a streaming composition over the existing pieces — a raw document
  * log's live tail, per-batch quality + dedup, a curated output log, and
  * the durable [[SignatureTableView]] that makes near-dedup INCREMENTAL:
  * each micro-batch is checked against the whole curated corpus so far at
  * cost ∝ batch (banded equi-join against stored signatures), never
  * ∝ corpus. This is the operational shape of production pretraining
  * ingest — crawls arrive continuously, the curated corpus and its
  * signature artifact grow together, and nothing ever rescans history.
  *
  * Per micro-batch (the `(sigView.since, logSince]` delta — the
  * reference build loop's interval):
  *  1. quality floor ([[graft.ops.TextAnalysis.qualityCol]]);
  *  2. exact dedup within the batch (lowest id per content hash);
  *  3. near-dedup within the batch (MinHash LSH self-join, drop the
  *     higher id of every verified pair);
  *  4. near-dedup against the STORED signature table (drop any new doc
  *     within `threshold` of a curated doc);
  *  5. survivors append to the curated log; their signatures absorb into
  *     the signature table, advancing its cursor.
  *
  * Recovery: survivors are a deterministic function of (batch, stored
  * signature state). The whole batch is guarded by the signature cursor
  * (`upto > sigView.since` — a replay after the absorb committed is
  * skipped outright, so survivors are never recomputed against a state
  * that already contains them), the curated append by its own seq
  * high-water mark in `commitFile` (skip when `upto ≤` the stored mark
  * — seq-based, so it stays correct even if the streaming checkpoint is
  * lost and epoch ids restart), and the absorb again by the cursor. Every
  * crash window therefore replays to the same curated log + signature
  * state the uninterrupted run produces. */
final class StreamingCurator(
    source: FlumeLog,
    curated: FlumeLog,
    sigView: SignatureTableView,
    commitFile: String,
    idCol: String = "doc_id",
    textCol: String = "text",
    minQuality: Double = 0.2,
    threshold: Double = 0.6,
    bands: Int = 32,
    maxBucket: Int = 1000,
    checkpointDir: Option[String] = None) {

  private val seqCol = source.seqCol
  private val markPath = Paths.get(commitFile)

  private def appendedUpto: Long =
    if (Files.exists(markPath)) Files.readString(markPath).trim.toLong else -1L

  /** The curation decision for one batch: quality floor → exact dedup →
    * self near-dedup → incremental near-dedup vs the stored corpus.
    * Pure function of (batch, signature table state). Returns the
    * survivors and the batch's PERSISTED `(id, hs, sig)` signature
    * table — text is shingled and minhashed exactly ONCE per batch, and
    * that one table serves the self-join, the incremental check and the
    * absorb (the caller unpersists it after the absorb lands). */
  private[streaming] def surviveBatch(batch: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // one quality/text pass: the filtered batch is staged once and feeds
    // the exact-dedup agg, the signature pass and the survivor join
    val q = batch.where(graft.ops.TextAnalysis.qualityCol(col(textCol)) >= minQuality).persist()
    val exactKeep = q.groupBy(xxhash64(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val exact = q.join(exactKeep, Seq(idCol), "left_semi")
    val st = graft.ops.Dedup.signatureTable(exact, idCol, textCol).persist()
    val selfDrop = graft.ops.Dedup.minhashLshFromSigs(st,
        threshold = threshold, verifyExact = true, bands = bands, maxBucket = maxBucket)
      .select(col("id_b").as(idCol)).distinct()
    // the self-join's pairs are (lower id, higher id): dropping id_b and
    // keeping the remaining side for the cross check preserves the
    // keep-lowest-id rule; docs with empty shingle sets bypass both
    // near-dedup stages (they are absent from st) but survive
    val crossDrop = sigView.frameOption match {
      case Some(base) =>
        graft.ops.Dedup.minhashLshIncrementalFromSigs(
            st.join(selfDrop.withColumnRenamed(idCol, "id"), Seq("id"), "left_anti"), base,
            threshold = threshold, verifyExact = true, bands = bands, maxBucket = maxBucket)
          .select(col("id_a").as(idCol)).distinct()
      case None => selfDrop.limit(0)
    }
    val survivors = exact
      .join(selfDrop.unionByName(crossDrop).distinct(), Seq(idCol), "left_anti")
      .select(col(idCol), col(textCol))
    (survivors, st, q)
  }

  val query: StreamingQuery = {
    var w = source.readStreamFrom(sigView.since).writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val upto = batch.agg(max(col(seqCol))).head().getLong(0)
          if (upto > sigView.since) { // replay after the absorb committed: skip whole
            val (sv, st, staged) = surviveBatch(batch.drop(seqCol))
            val survivors = sv.localCheckpoint(true)
            if (upto > appendedUpto) { // replay after the append committed: skip append
              if (!survivors.isEmpty) curated.append(survivors)
              Files.writeString(markPath, upto.toString) // append durable before the mark
            }
            // absorbed even when empty so the cursor tracks the log and
            // restarts never re-deliver a fully-curated interval; the
            // survivors' rows of the ALREADY-COMPUTED signature table
            // land directly — no re-shingling at absorb
            sigView.absorbSigs(
              st.join(survivors.select(col(idCol).as("id")), Seq("id"), "left_semi"), upto)
            st.unpersist(blocking = false)
            staged.unpersist(blocking = false)
            ()
          }
        }
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }

  /** Block until everything appended so far is curated (read gate). */
  def awaitParity(): Unit = query.processAllAvailable()

  def stop(): Unit = query.stop()
}

object MediaStreamingCurator {
  /** The curation decision for one batch — a PURE function of
    * (batch, stored feature state), shared by the live stream and any
    * crash-window replay: featurize once (decodability floor), drop
    * the higher id of every within-batch pair, drop batch ids matching
    * the stored table, survivors = the staged media rows of the kept
    * ids. Returns (survivors, the batch's persisted feature table, the
    * staged batch); the caller unpersists the latter two after the
    * absorb lands. */
  private[streaming] def decide(
      binding: MediaDedupBinding,
      batch: DataFrame,
      idCol: String,
      seqCol: String): (DataFrame, DataFrame, DataFrame) = {
    val staged = batch.persist()
    val feats = binding.featurize(staged).persist() // decode ONCE per batch
    val selfDrop = binding.selfPairs(feats).select(col("id_b").as(idCol)).distinct()
    val crossDrop = binding.storedOption match {
      case Some(stored) =>
        binding.crossPairs(
            feats.join(selfDrop, Seq(idCol), "left_anti"), stored)
          .select(col("id_a").as(idCol)).distinct()
      case None => selfDrop.limit(0)
    }
    val keptIds = feats.select(idCol)
      .join(selfDrop.unionByName(crossDrop).distinct(), Seq(idCol), "left_anti")
    val survivors = staged.drop(seqCol).join(keptIds, Seq(idCol), "left_semi")
    (survivors, feats, staged)
  }
}

/** Modality binding for [[MediaStreamingCurator]]: the four operations
  * that differ between media types (image dHash, audio fingerprint,
  * …) while the curation ENGINE — one decode per batch, self near-dup,
  * incremental check, append + absorb under the exactly-once cursor
  * discipline — stays shared. `featurize` must emit one row per
  * DECODABLE input keyed by `media_id`; `selfPairs` emits within-batch
  * near-dup pairs oriented `(id_a < id_b)` (the higher id drops, the
  * keep-lowest rule the text curator uses); `crossPairs` emits
  * batch-vs-stored pairs with `id_a` = batch side (the batch id
  * drops). */
trait MediaDedupBinding {
  /** Stored-table cursor (seq HWM of the last absorbed interval). */
  def since: Long
  /** Stored feature table, `None` until the first absorb. */
  def storedOption: Option[DataFrame]
  /** Decode + feature the batch ONCE: `(media_id, …features)`. */
  def featurize(media: DataFrame): DataFrame
  /** Within-batch near-dup pairs `(id_a < id_b)` over the features. */
  def selfPairs(features: DataFrame): DataFrame
  /** Batch-vs-stored near-dup pairs (`id_a` = batch side). */
  def crossPairs(features: DataFrame, stored: DataFrame): DataFrame
  /** Land survivors' PRECOMPUTED feature rows, advance the cursor. */
  def absorb(features: DataFrame, upto: Long): Unit
}

object MediaDedupBinding {
  /** Image binding: dHash ([[graft.ops.Multimodal.perceptualHash]])
    * over the [[graft.views.PhashTableView]]. */
  def image(view: graft.views.PhashTableView,
      maxHamming: Int = 7, maxBucket: Int = 256): MediaDedupBinding =
    new MediaDedupBinding {
      def since: Long = view.since
      def storedOption: Option[DataFrame] = view.frameOption
      def featurize(media: DataFrame): DataFrame =
        graft.ops.Multimodal.perceptualHash(media)
      def selfPairs(features: DataFrame): DataFrame =
        graft.ops.Multimodal.perceptualNearDup(features, maxHamming, maxBucket)
      def crossPairs(features: DataFrame, stored: DataFrame): DataFrame =
        graft.ops.Multimodal.perceptualNearDupIncremental(
          features, stored, maxHamming, maxBucket)
      def absorb(features: DataFrame, upto: Long): Unit =
        view.absorbHashes(features, upto)
    }

  /** Embedding binding: banded hyperplane signatures over the
    * [[graft.views.EmbeddingSigTableView]] — continuous curation for a
    * vector corpus (the SemDeDup-adjacent ingest shape). Unlike the
    * media bindings, the exact-cosine verify needs the stored VECTORS;
    * those are exactly the curator's own curated log, so
    * `storedVectors` reads it back and NO second vector artifact
    * exists — the signature table stays 8 bytes/vector. The signature
    * is computed once at featurize for the ABSORB; the self and
    * incremental passes re-derive it from the vectors (one codegen
    * pass each — the featurize cost here is arithmetic, not the decode
    * the media bindings amortize). */
  def embedding(view: graft.views.EmbeddingSigTableView,
      storedVectors: () => DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bands: Int = 4, bitsPerBand: Int = 8,
      threshold: Double = 0.95, maxBucket: Int = 1024): MediaDedupBinding =
    new MediaDedupBinding {
      def since: Long = view.since
      def storedOption: Option[DataFrame] = view.frameOption
      def featurize(media: DataFrame): DataFrame =
        media.select(col(idCol), col(vecCol),
          graft.ops.Similarity.hyperplaneSignature(col(vecCol), bands * bitsPerBand).as("sig"))
      def selfPairs(features: DataFrame): DataFrame =
        graft.ops.Dedup.embeddingNearDup(features.select(col(idCol), col(vecCol)),
          idCol, vecCol, bands, bitsPerBand, threshold, maxBucket)
      def crossPairs(features: DataFrame, stored: DataFrame): DataFrame =
        graft.ops.Dedup.embeddingNearDupIncrementalFromSigs(
          features.select(col(idCol), col(vecCol)), stored, storedVectors(),
          idCol, vecCol, bands, bitsPerBand, threshold, maxBucket)
      def absorb(features: DataFrame, upto: Long): Unit =
        view.absorbSigs(features.select(col(idCol), col("sig")), upto)
    }

  /** Video binding: per-frame dHash sequences
    * ([[graft.ops.Multimodal.videoFrameHashes]] — MULTIPLE feature rows
    * per item, which the engine's id-level semi/anti joins absorb
    * unchanged) over the [[graft.views.FrameHashTableView]]; near-dup
    * requires every aligned frame within `maxHamming` and equal frame
    * counts on both sides. */
  def video(view: graft.views.FrameHashTableView,
      maxHamming: Int = 7, maxBucket: Int = 256): MediaDedupBinding =
    new MediaDedupBinding {
      def since: Long = view.since
      def storedOption: Option[DataFrame] = view.frameOption
      def featurize(media: DataFrame): DataFrame =
        graft.ops.Multimodal.videoFrameHashes(media)
      def selfPairs(features: DataFrame): DataFrame =
        graft.ops.Multimodal.videoNearDup(features, maxHamming, maxBucket)
      def crossPairs(features: DataFrame, stored: DataFrame): DataFrame =
        graft.ops.Multimodal.videoNearDupIncremental(
          features, stored, maxHamming, maxBucket)
      def absorb(features: DataFrame, upto: Long): Unit =
        view.absorbHashes(features, upto)
    }

  /** Audio binding: trim + duration-proportional window fingerprint
    * ([[graft.ops.Multimodal.audioFingerprint]]) over the
    * [[graft.views.AudioFingerprintTableView]]; the `n_windows` length
    * gate rides the feature row into both near-dup stages. */
  def audio(view: graft.views.AudioFingerprintTableView,
      maxHamming: Int = 7, maxBucket: Int = 256): MediaDedupBinding =
    new MediaDedupBinding {
      def since: Long = view.since
      def storedOption: Option[DataFrame] = view.frameOption
      def featurize(media: DataFrame): DataFrame =
        graft.ops.Multimodal.audioFingerprint(media)
      def selfPairs(features: DataFrame): DataFrame =
        graft.ops.Multimodal.audioNearDup(features, maxHamming, maxBucket)
      def crossPairs(features: DataFrame, stored: DataFrame): DataFrame =
        graft.ops.Multimodal.audioNearDupIncremental(
          features, stored, maxHamming, maxBucket)
      def absorb(features: DataFrame, upto: Long): Unit =
        view.absorbFingerprints(features, upto)
    }
}

/** Continuous MEDIA curation — [[StreamingCurator]]'s discipline
  * carried to the multimodal tables: a raw media log's live tail,
  * per-batch decode-ONCE featurization, within-batch near-dedup,
  * incremental near-dedup against the stored feature table, survivors
  * appended to the curated log and their feature rows absorbed. This
  * is the operational pretraining-ingest shape for images/audio:
  * crawled media arrive continuously, the curated corpus and its
  * 8-bytes-per-item feature artifact grow together, and the raw bytes
  * are decoded exactly once — at ingest — never at dedup time.
  *
  * Per micro-batch (the `(binding.since, logSince]` delta):
  *  1. decodability floor: `featurize` drops rows that do not decode
  *     (the media analog of the text curator's quality floor — a blob
  *     with no pixels/samples is garbage, unlike a short text with no
  *     shingles, which that curator deliberately lets through);
  *  2. near-dedup within the batch (`selfPairs`, drop the higher id);
  *  3. near-dedup against the STORED feature table (`crossPairs` on
  *     the self-survivors only, drop the batch id);
  *  4. survivors append to the curated log; their ALREADY-COMPUTED
  *     feature rows absorb into the table, advancing its cursor.
  *
  * Recovery is the text curator's exactly-once discipline verbatim:
  * the whole batch is guarded by the feature-table cursor
  * (`upto > binding.since`), the curated append by the seq HWM in
  * `commitFile`, and the absorb again by the cursor — every crash
  * window replays to the same curated log + feature state as the
  * uninterrupted run.
  *
  * 100 TB shape: the decode (the dominant cost) runs once per item
  * ever; the self near-dup shuffles 8-byte hashes inside pigeonhole
  * buckets; the incremental check broadcasts the batch's count-fenced
  * segment keys, so the stored table — the corpus — never shuffles;
  * the media BYTES never enter any exchange (survivor selection is an
  * id anti-join against the staged batch). */
final class MediaStreamingCurator(
    source: FlumeLog,
    curated: FlumeLog,
    binding: MediaDedupBinding,
    commitFile: String,
    idCol: String = "media_id",
    checkpointDir: Option[String] = None) {

  private val seqCol = source.seqCol
  private val markPath = Paths.get(commitFile)

  private def appendedUpto: Long =
    if (Files.exists(markPath)) Files.readString(markPath).trim.toLong else -1L

  /** The curation decision for one batch — pure function of
    * (batch, stored feature state); see
    * [[MediaStreamingCurator.decide]]. */
  private[streaming] def surviveBatch(batch: DataFrame): (DataFrame, DataFrame, DataFrame) =
    MediaStreamingCurator.decide(binding, batch, idCol, seqCol)

  val query: StreamingQuery = {
    var w = source.readStreamFrom(binding.since).writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val upto = batch.agg(max(col(seqCol))).head().getLong(0)
          if (upto > binding.since) { // replay after the absorb committed: skip whole
            val (sv, feats, staged) = surviveBatch(batch)
            val survivors = sv.localCheckpoint(true)
            if (upto > appendedUpto) { // replay after the append committed: skip append
              if (!survivors.isEmpty) curated.append(survivors)
              Files.writeString(markPath, upto.toString) // append durable before the mark
            }
            // absorbed even when empty so the cursor tracks the log;
            // the survivors' rows of the ALREADY-COMPUTED feature
            // table land directly — no re-decode at absorb
            binding.absorb(
              feats.join(survivors.select(col(idCol)), Seq(idCol), "left_semi"), upto)
            feats.unpersist(blocking = false)
            staged.unpersist(blocking = false)
            ()
          }
        }
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }

  /** Block until everything appended so far is curated (read gate). */
  def awaitParity(): Unit = query.processAllAvailable()

  def stop(): Unit = query.stop()
}
