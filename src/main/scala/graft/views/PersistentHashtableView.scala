package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

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
    spark: SparkSession,
    protected val dir: String,
    protected val protocolVersion: Int,
    keyCol: String,
    seqCol: String) extends FlumeView with DeltaProtocol {

  locally {
    openProtocol()
    // compact crash recovery: once the cursor marker exists, compact.tmp
    // is the COMPLETE merge of all committed deltas at the (unchanged)
    // manifest cursor — the deletes may have stopped anywhere, leaving a
    // PARTIAL delta set that would silently lose keys if read. Adopt the
    // tmp in every such interleaving: delete whatever deltas remain,
    // move tmp in. Without the marker (death mid-write of tmp, or tmp
    // from a compact whose cursor has since moved on under an old
    // binary) tmp is garbage: leave the intact deltas and let the next
    // compact() clear it.
    val tmp = root.resolve("compact.tmp")
    val marker = root.resolve("compact.cursor")
    val markerCursor =
      if (Files.exists(marker)) scala.util.Try(Files.readString(marker).trim.toLong).toOption
      else None
    if (sinceSeq >= 0 && markerCursor.contains(sinceSeq) &&
        Files.exists(tmp.resolve("_SUCCESS"))) {
      committedBatchDirs().foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))
      Files.move(tmp, batchPath(sinceSeq))
      Files.delete(marker)
    } else if (markerCursor.isDefined) Files.delete(marker)
  }

  private def latest(df: DataFrame): DataFrame = {
    val payload = struct(df.columns.filter(_ != keyCol).map(col).toIndexedSeq: _*)
    df.groupBy(col(keyCol))
      .agg(max_by(payload, col(seqCol)).as("__v"))
      .select(col(keyCol), col("__v.*"))
  }

  def absorb(entries: DataFrame, upto: Long): Unit = {
    latest(entries)
      .write.mode("overwrite").parquet(batchPath(upto).toString)
    sinceSeq = upto
    writeManifest() // delta durable before the cursor moves
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

  /** Snapshot read: the per-key-latest table as of the absorbed batch
    * whose `upto ≤ seq` — log-centric time travel over the delta
    * layout (the LSM read path, restricted to the deltas that existed
    * at that cursor). Snapshots exist at ABSORBED-BATCH granularity
    * (each delta stores its batch's per-key latest, so intra-batch
    * history is already folded), and [[compact]] folds all history
    * into the base — the travel window is the uncompacted delta chain,
    * the same trade a compacted changelog topic makes. */
  def frameAsOf(seq: Long): DataFrame = {
    val dirs = committedBatchDirs()
      .filter(_.getFileName.toString.stripPrefix("batch=").toLong <= seq)
      .map(_.toString)
    if (dirs.isEmpty)
      throw new IllegalStateException(s"no committed batch at or before seq=$seq (compacted or empty)")
    latest(spark.read.parquet(dirs: _*))
  }

  /** Collapse all committed deltas into one base delta at the current
    * cursor — the compacted-topic rewrite. Protocol: write the merged
    * base under `compact.tmp`, commit it with the `compact.cursor`
    * marker, delete the old deltas, move the base to `batch=<cursor>`.
    * The manifest cursor never moves; a death anywhere after the marker
    * lands is recovered at open by adopting the complete tmp over
    * whatever deltas remain (see the constructor), and a death before it
    * leaves every delta intact — so readers see either the old deltas or
    * the base in EVERY crash window, never a partial delta set. */
  def compact(): Unit = {
    val dirs = committedBatchDirs()
    if (dirs.size <= 1) return
    val tmp = root.resolve("compact.tmp")
    val marker = root.resolve("compact.cursor")
    if (Files.exists(marker)) Files.delete(marker)
    if (Files.exists(tmp)) FsLists.walkDeepestFirst(tmp).foreach(Files.delete)
    frame.write.parquet(tmp.toString)
    Files.writeString(marker, sinceSeq.toString) // tmp is now the commit point
    dirs.foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))
    Files.move(tmp, batchPath(sinceSeq))
    Files.delete(marker)
  }
}

object PersistentHashtableView {
  def apply(dir: String, keyCol: String, seqCol: String = "seq", version: Int = 1): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new PersistentHashtableView(db.log.spark, s"$dir/$name", v, keyCol, seqCol)
    }
  }
}
