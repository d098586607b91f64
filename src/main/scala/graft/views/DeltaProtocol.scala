package graft.views

import java.nio.file.{Files, Path, Paths}

/** The ONE copy of the durable-view delta-store protocol shared by
  * every parquet-backed view (index, hashtable, IVF, signature table):
  *
  *  - each absorbed batch lands under `batch=<upto>/` (batch-atomic:
  *    Spark's directory commit);
  *  - `MANIFEST` holds `(version, since)` and is written AFTER the
  *    delta — an orphaned uncommitted batch directory is invisible to
  *    readers and pruned at open (it must not resurrect once a later
  *    absorb advances the cursor past its upto);
  *  - a stored version ≠ the mounted version wipes the state back to
  *    since = -1 at open — flume's version-bump rebuild rule
  *    (`/root/reference/README.md:26-29`).
  *
  * Views mix this in and keep only their data plane (what a delta
  * contains, how deltas merge at read). Crash-recovery fixes land here
  * once, for all views.
  */
private[views] trait DeltaProtocol {
  /** Store directory (constructor parameter of the concrete view). */
  protected def dir: String
  /** Mounted view version (bump ⇒ destroy + rebuild at open). */
  protected def protocolVersion: Int

  protected lazy val root: Path = Paths.get(dir)
  private lazy val manifest: Path = root.resolve("MANIFEST")
  @volatile protected var sinceSeq: Long = -1L

  def since: Long = sinceSeq

  /** Call once from the concrete view's constructor. */
  protected def openProtocol(): Unit = {
    Files.createDirectories(root)
    readManifest() match {
      case Some((v, s)) if v == protocolVersion => sinceSeq = s
      case Some(_)                              => destroy()
      case None                                 => ()
    }
    pruneOrphans()
  }

  protected def readManifest(): Option[(Int, Long)] =
    if (!Files.exists(manifest)) None
    else Files.readString(manifest).trim.split("\\s+") match {
      case Array(v, s) => Some((v.toInt, s.toLong))
      case _           => None
    }

  /** Commit the cursor; the delta must already be durable. */
  protected def writeManifest(): Unit =
    Files.writeString(manifest, s"$protocolVersion $sinceSeq")

  protected def batchPath(upto: Long): Path = root.resolve(s"batch=$upto")

  private def batchUpto(p: Path): Long =
    p.getFileName.toString.stripPrefix("batch=").toLong

  protected def allBatchDirs(): Seq[Path] =
    FsLists.children(root)
      .filter(_.getFileName.toString.startsWith("batch="))
      .sortBy(batchUpto)

  /** Deltas visible to readers: committed (upto ≤ cursor), in order. */
  protected def committedBatchDirs(): Seq[Path] =
    allBatchDirs().filter(batchUpto(_) <= sinceSeq)

  private def pruneOrphans(): Unit =
    allBatchDirs().filter(batchUpto(_) > sinceSeq)
      .foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))

  def destroy(): Unit = {
    sinceSeq = -1L
    if (Files.isDirectory(root)) {
      FsLists.walkDeepestFirst(root).filterNot(_ == root).foreach(Files.delete)
    }
  }
}
