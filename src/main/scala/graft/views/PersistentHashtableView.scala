package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable flumeview-hashtable: latest-record-per-key as a
  * log-structured parquet table — the "compacted changelog" shape.
  *
  * Writes are the shared [[DeltaProtocol]] (each absorbed batch's
  * per-key latest lands under `batch=<upto>/`, manifest commits after
  * the delta, orphans pruned at open, version bump wipes). Reads merge
  * the deltas with one `max_by(seq)` aggregate — the LSM read path;
  * [[compact]] collapses all committed deltas into a single base delta
  * so read cost stays O(keys), the same rewrite a compacted topic or an
  * LSM level merge performs. At cluster scale the deltas are
  * partitioned tables and compaction is a per-bucket rewrite job; the
  * manifest stays the tiny driver-side commit record. */
final class PersistentHashtableView(
    protected val spark: SparkSession,
    protected val dir: String,
    protected val protocolVersion: Int,
    keyCol: String,
    seqCol: String,
    compactEvery: Int = 0) extends FlumeView with CompactableDeltas {

  override protected def autoCompactEvery: Int = compactEvery

  openProtocol() // includes compact crash recovery (see DeltaProtocol)

  private def latest(df: DataFrame): DataFrame = {
    val payload = struct(df.columns.filter(_ != keyCol).map(col).toIndexedSeq: _*)
    df.groupBy(col(keyCol))
      .agg(max_by(payload, col(seqCol)).as("__v"))
      .select(col(keyCol), col("__v.*"))
  }

  /** Reads fold to latest-per-key, so the compacted base does too. */
  override protected def mergeDeltas(union: DataFrame): DataFrame = latest(union)

  def absorb(entries: DataFrame, upto: Long): Unit = {
    latest(entries)
      .write.mode("overwrite").parquet(batchPath(upto).toString)
    sinceSeq = upto
    writeManifest() // delta durable before the cursor moves
    maybeCompact()
  }

  /** Merged view of all committed deltas (the LSM read path). */
  def frame: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    if (dirs.isEmpty) throw new IllegalStateException("hashtable empty")
    latest(spark.read.parquet(dirs: _*))
  }

  override def frameOption: Option[DataFrame] =
    if (committedBatchDirs().isEmpty) None else Some(frame)

  def get(key: Any): DataFrame = frame.where(col(keyCol) === lit(key))
}

object PersistentHashtableView {
  def apply(dir: String, keyCol: String, seqCol: String = "seq", version: Int = 1, compactEvery: Int = 0): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new PersistentHashtableView(db.log.spark, s"$dir/$name", v, keyCol, seqCol, compactEvery)
    }
  }
}
