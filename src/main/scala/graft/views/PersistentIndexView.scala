package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Durable view state on disk: batch-atomic parquet deltas plus a
  * manifest `(version, since)`.
  *
  * Implements flume's full view lifecycle contract:
  *  - incremental: each absorbed batch lands under `batch=<upto>/`, so
  *    restart resumes from the manifest cursor instead of replaying the
  *    log (`/root/reference/index.js:36-39`);
  *  - crash-safe: the manifest is written after the delta — an orphaned
  *    uncommitted batch directory is ignored by readers and overwritten
  *    on retry;
  *  - version-triggered rebuild: a mounted view whose stored version
  *    differs wipes its state and returns to since = -1, exactly the
  *    "version number changes ⇒ just rebuilds the view" rule
  *    (`/root/reference/README.md:26-29`).
  *
  * At cluster scale the same layout is a partitioned table on object
  * storage; the manifest is the tiny driver-side commit record.
  */
final class PersistentIndexView(
    spark: SparkSession,
    dir: String,
    version: Int,
    keys: Column,
    seqCol: String,
    val indexedColumn: Option[String] = None) extends FlumeView {

  private val root: Path = Paths.get(dir)
  private val manifest: Path = root.resolve("MANIFEST")
  @volatile private var sinceSeq: Long = -1L

  locally {
    Files.createDirectories(root)
    readManifest() match {
      case Some((v, s)) if v == version => sinceSeq = s
      case Some(_)                      => destroy() // version bump: rebuild
      case None                         => ()
    }
    pruneOrphans()
  }

  /** Delete batch directories beyond the manifest cursor. An orphan is a
    * delta written just before a crash whose manifest commit never landed;
    * readers ignore it today, but once a post-restart absorb advances the
    * cursor past its `upto` the stale overlapping delta would become
    * visible and duplicate entries. Pruning at construction closes that
    * resurrection window (the reference replays the log into the view
    * instead — `/root/reference/index.js:36-39` — so it can never observe
    * a half-committed delta). */
  private def pruneOrphans(): Unit =
    FsLists.children(root)
      .filter(p => p.getFileName.toString.startsWith("batch="))
      .filter(p => p.getFileName.toString.stripPrefix("batch=").toLong > sinceSeq)
      .foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))

  private def readManifest(): Option[(Int, Long)] =
    if (!Files.exists(manifest)) None
    else Files.readString(manifest).trim.split("\\s+") match {
      case Array(v, s) => Some((v.toInt, s.toLong))
      case _           => None
    }

  private def writeManifest(): Unit =
    Files.writeString(manifest, s"$version $sinceSeq")

  private def committedBatchDirs(): Seq[Path] =
    FsLists.children(root)
      .filter(p => p.getFileName.toString.startsWith("batch="))
      .filter(p => p.getFileName.toString.stripPrefix("batch=").toLong <= sinceSeq)
      .sortBy(_.getFileName.toString.stripPrefix("batch=").toLong)

  def since: Long = sinceSeq

  def absorb(entries: DataFrame, upto: Long): Unit = {
    entries.select(explode(keys).as("key"), col(seqCol).as("seq"))
      .write.mode("overwrite").parquet(root.resolve(s"batch=$upto").toString)
    sinceSeq = upto
    writeManifest() // delta is durable before the cursor moves
  }

  def frame: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType))))
    else spark.read.parquet(dirs: _*)
  }

  override def frameOption: Option[DataFrame] = Some(frame)

  def get(key: String): DataFrame =
    frame.where(col("key") === lit(key)).orderBy("seq")

  def destroy(): Unit = {
    sinceSeq = -1L
    if (Files.isDirectory(root)) {
      FsLists.walkDeepestFirst(root).filterNot(_ == root).foreach(Files.delete)
    }
  }
}

object PersistentIndexView {
  def apply(dir: String, keys: Column, seqCol: String = "seq", version: Int = 1): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new PersistentIndexView(db.log.spark, s"$dir/$name", v, keys, seqCol)
    }
  }

  /** Durable single-column equality index, eligible for [[Query]] index
    * selection (see [[IndexView.onColumn]]). */
  def onColumn(dir: String, column: String, seqCol: String = "seq", version: Int = 1): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new PersistentIndexView(db.log.spark, s"$dir/$name", v,
          array(col(column).cast("string")), seqCol, Some(column))
    }
  }
}
