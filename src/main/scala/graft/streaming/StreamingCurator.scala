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
