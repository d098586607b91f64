package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed-upsert changelog between two log positions — the CDC read of
  * the hashtable family. The reference rebuilds any view by replaying
  * the log (`/root/reference/README.md:13-17`); this is the incremental
  * dual: "what would the latest-per-key view emit between seq `from`
  * and seq `to`?", answered from the log itself (the source of truth),
  * so it needs no stored view, no snapshot pair, and is exact for any
  * `(from, to]` window — batch-granular `frameAsOf` diffs can't see
  * inside a delta, this can.
  *
  * Shape: ONE map-side-combined aggregate over the log filtered to
  * `seq <= to`. Both sides of the diff come out of the same group:
  * `max_by(payload, seq)` is the after-image, and the before-image is
  * the same `max_by` with the order key nulled out past `from`
  * (aggregates skip null order keys, so it folds to "latest at or
  * before `from`"). Keys untouched in `(from, to]` are dropped by a
  * `HAVING max(seq) > from` — no second scan, no join, no window. At
  * 100 TB the `seq <= to` conjunct prunes the log's seq-bucketed layout
  * before the shuffle, and the shuffle carries one pre-reduced row per
  * key per map partition.
  */
object Changelog {

  /** Emits one row per key whose latest payload changed in
    * `(fromSeq, toSeq]`: `op` (`insert` if the key was unseen at
    * `fromSeq`, else `update`), the old/new seq and the old/new value
    * of `valueCol` (old side null on insert). */
  def changesBetween(
      log: DataFrame,
      keyCol: String,
      seqCol: String,
      valueCol: String,
      fromSeq: Long,
      toSeq: Long): DataFrame = {
    require(fromSeq <= toSeq, s"fromSeq $fromSeq must be <= toSeq $toSeq")
    val seq = col(seqCol)
    val beforeOrder = when(seq <= fromSeq, seq) // null past `from` ⇒ ignored by max_by
    log.where(seq <= toSeq)
      .groupBy(col(keyCol))
      .agg(
        max(beforeOrder).as("old_seq"),
        max_by(col(valueCol), beforeOrder).as("old_value"),
        max(seq).as("new_seq"),
        max_by(col(valueCol), seq).as("new_value"))
      .where(col("new_seq") > fromSeq)
      .select(col(keyCol),
        when(col("old_seq").isNull, lit("insert")).otherwise(lit("update")).as("op"),
        col("old_seq"), col("old_value"), col("new_seq"), col("new_value"))
  }
}
