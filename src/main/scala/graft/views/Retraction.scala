package graft.views

import graft.core.ParquetLog
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Paths}

/** Cross-artifact corpus retraction (takedown): remove documents from
  * the curated LOG ([[graft.core.ParquetLog.retract]] — the compaction
  * rewrite path) AND their feature rows from the modality table
  * (`retractWhere` — the filtered-compaction path), atomically enough
  * for a pretraining pipeline: an INTENT file is made durable before
  * either rewrite, so a crash in the window between them (log rewritten,
  * feature delete lost — the dangerous half-state, where a re-ingested
  * near-dup of the retracted doc would still be dropped against ghost
  * signatures) is closed by [[recover]] at the next open. Both halves
  * are idempotent (retracting absent rows rewrites nothing / rewrites to
  * the same state), so the replay is unconditional re-execution.
  *
  * This is the deletion story the reference's append-only model lacks
  * and a real corpus pipeline cannot ship without: rights-holder
  * takedowns and GDPR erasure must remove the BYTES — log rows, stored
  * signatures, and (because retraction is a compaction) every
  * `frameAsOf` snapshot that could resurrect them. */
object Retraction {

  /** Take down `ids` (the log's `idCol` values) across the family.
    * Order: intent durable → log rewrite → feature rewrite → intent
    * cleared. Returns the number of log rows removed. */
  def retract(
      log: ParquetLog,
      idCol: String,
      ids: Seq[Long],
      retractFeatures: Seq[Long] => Unit,
      intentFile: String): Long = {
    val p = Paths.get(intentFile)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    // the intent must be ALL-OR-NOTHING durable: a torn plain write
    // would make recover() execute a truncated id list (retracting a
    // wrong document, dropping the tail of the takedown) — write-then-
    // atomic-rename, the same commit protocol as every marker here
    val tmp = Paths.get(intentFile + ".tmp")
    Files.writeString(tmp, ids.mkString(","))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val removed = log.retract(col(idCol).isin(ids: _*))
    retractFeatures(ids)
    Files.delete(p)
    removed
  }

  /** Close an interrupted takedown window: if an intent file survives,
    * both halves re-run (idempotent) and the intent clears. Call at
    * family open, before serving reads. Returns the retracted ids (empty
    * when no window was open). */
  def recover(
      log: ParquetLog,
      idCol: String,
      retractFeatures: Seq[Long] => Unit,
      intentFile: String): Seq[Long] = {
    val p = Paths.get(intentFile)
    // a leftover .tmp is a takedown that was never made durable (the
    // caller never got an acknowledgment) — discard it
    val tmp = Paths.get(intentFile + ".tmp")
    if (Files.exists(tmp)) Files.delete(tmp)
    if (!Files.exists(p)) return Seq.empty
    val ids = Files.readString(p).trim.split(",").filter(_.nonEmpty).map(_.toLong).toSeq
    if (ids.nonEmpty) {
      log.retract(col(idCol).isin(ids: _*))
      retractFeatures(ids)
    }
    Files.delete(p)
    ids
  }
}
