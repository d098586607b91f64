package graft.views

import graft.core.{FlumeDb, FlumeView, ViewDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Durable, streaming-maintained MinHash signature table — the
  * continuous-curation bridge between the flume view machinery and the
  * dedup stack: documents append to the log, each absorbed batch lands
  * its `(id, hs, sig)` rows ([[graft.ops.Dedup.signatureTable]]) as a
  * batch-atomic parquet delta, and every new batch can be near-dup
  * checked against the WHOLE corpus so far via
  * [[graft.ops.Dedup.minhashLshIncrementalStored]] — recurring cost
  * ∝ batch, never corpus, with the signature pass itself incremental
  * (each document's shingles are hashed exactly once, at ingest).
  *
  * Same delta protocol as [[PersistentIndexView]] (manifest after
  * delta ⇒ crash-safe; orphan pruning at open; version bump ⇒ wipe and
  * rebuild), so it slots under [[graft.streaming.StreamingViewRunner]]
  * with exactly-once recovery. At cluster scale this is the stored
  * signature artifact every production dedup pipeline keeps — here it
  * is also a first-class flume view with a cursor and the rebuild
  * contract.
  */
final class SignatureTableView(
    spark: SparkSession,
    dir: String,
    version: Int,
    idCol: String,
    textCol: String,
    perms: Int = 64) extends FlumeView {

  private val root: Path = Paths.get(dir)
  private val manifest: Path = root.resolve("MANIFEST")
  @volatile private var sinceSeq: Long = -1L

  locally {
    Files.createDirectories(root)
    readManifest() match {
      case Some((v, s)) if v == version => sinceSeq = s
      case Some(_)                      => destroy()
      case None                         => ()
    }
    pruneOrphans()
  }

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

  private def committedBatchDirs(): Seq[Path] =
    FsLists.children(root)
      .filter(p => p.getFileName.toString.startsWith("batch="))
      .filter(p => p.getFileName.toString.stripPrefix("batch=").toLong <= sinceSeq)
      .sortBy(_.getFileName.toString.stripPrefix("batch=").toLong)

  def since: Long = sinceSeq

  def absorb(entries: DataFrame, upto: Long): Unit = {
    graft.ops.Dedup.signatureTable(entries, idCol, textCol, perms)
      .write.mode("overwrite").parquet(root.resolve(s"batch=$upto").toString)
    sinceSeq = upto
    Files.writeString(manifest, s"$version $sinceSeq")
  }

  /** The accumulated `(id, hs, sig)` table — feed to
    * [[graft.ops.Dedup.minhashLshIncrementalStored]]. */
  def sigs: DataFrame = {
    val dirs = committedBatchDirs().map(_.toString)
    require(dirs.nonEmpty, "signature table empty — absorb a batch first")
    spark.read.parquet(dirs: _*)
  }

  override def frameOption: Option[DataFrame] =
    if (committedBatchDirs().isEmpty) None else Some(sigs)

  def destroy(): Unit = {
    sinceSeq = -1L
    if (Files.isDirectory(root)) {
      FsLists.walkDeepestFirst(root).filterNot(_ == root).foreach(Files.delete)
    }
  }
}

object SignatureTableView {
  def apply(dir: String, idCol: String = "doc_id", textCol: String = "text",
      perms: Int = 64, version: Int = 1): ViewDef = {
    val v = version
    new ViewDef {
      def version: Int = v
      def create(db: FlumeDb, name: String) =
        new SignatureTableView(db.log.spark, s"$dir/$name", v, idCol, textCol, perms)
    }
  }
}
