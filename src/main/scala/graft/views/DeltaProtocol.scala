package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    recoverCompact()
  }

  protected def compactTmp: Path = root.resolve("compact.tmp")
  protected def compactMarker: Path = root.resolve("compact.cursor")

  /** Compaction crash recovery (no-op for views that never compact):
    * once the cursor marker exists, `compact.tmp` is the COMPLETE merge
    * of all committed deltas at the (unchanged) manifest cursor — the
    * delta deletes may have stopped anywhere, leaving a PARTIAL delta
    * set that would silently lose rows if read. Adopt the tmp in every
    * such interleaving: delete whatever deltas remain, move tmp in.
    * Without the marker (death mid-write of tmp, or a tmp whose cursor
    * has since moved on) tmp is garbage: leave the intact deltas and
    * let the next compact() clear it. Pure filesystem — shared by every
    * delta-store view regardless of its data plane. */
  private def recoverCompact(): Unit = {
    val markerCursor =
      if (Files.exists(compactMarker))
        scala.util.Try(Files.readString(compactMarker).trim.toLong).toOption
      else None
    if (sinceSeq >= 0 && markerCursor.contains(sinceSeq) &&
        Files.exists(compactTmp.resolve("_SUCCESS"))) {
      committedBatchDirs().foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))
      Files.move(compactTmp, batchPath(sinceSeq))
      Files.delete(compactMarker)
    } else if (markerCursor.isDefined) Files.delete(compactMarker)
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

  protected def batchUpto(p: Path): Long =
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

/** Shared compaction + snapshot reads for [[DeltaProtocol]] views whose
  * deltas are parquet directories. After thousands of absorbed batches
  * the delta chain is the classic small-files death at 100 TB — every
  * read lists and opens every `batch=` dir. [[compact]] collapses all
  * committed deltas into ONE base delta at the current cursor (the LSM
  * level-merge / compacted-changelog rewrite), crash-safe in every
  * window via the write-tmp → marker-commit → delete-deltas → move
  * protocol recovered by [[DeltaProtocol.openProtocol]]: readers always
  * see either the full delta chain or the full base, never a partial
  * set.
  *
  * [[frameAsOf]] is the dual: a snapshot read over the deltas that
  * existed at an earlier cursor — log-centric time travel at
  * absorbed-batch granularity. Compaction folds history into the base,
  * so the travel window is the uncompacted delta chain: the same trade
  * a compacted changelog topic makes. */
private[views] trait CompactableDeltas extends DeltaProtocol {
  protected def spark: SparkSession

  /** Reader-visible fold of the unioned delta rows: identity for
    * append-only views (index postings, signature rows); overridden
    * where reads fold (hashtable's latest-per-key). */
  protected def mergeDeltas(union: DataFrame): DataFrame = union

  /** Read a set of delta dirs as one frame (IVF overrides to keep its
    * partition-column discovery). */
  protected def readDeltas(dirs: Seq[Path]): DataFrame =
    spark.read.parquet(dirs.map(_.toString): _*)

  /** Write the merged base delta (IVF overrides to keep its cell
    * partitioning). */
  protected def writeMerged(df: DataFrame, path: Path): Unit =
    df.write.parquet(path.toString)

  /** When > 0, absorb paths call [[maybeCompact]] after committing each
    * delta, collapsing the chain whenever the committed delta count
    * reaches this bound — the small-files ceiling enforced inline, with
    * no external compaction job to schedule (deployments that want a
    * separate job leave this 0 and call [[compact]] themselves). */
  protected def autoCompactEvery: Int = 0

  protected def maybeCompact(): Unit =
    if (autoCompactEvery > 0 && committedBatchDirs().size >= autoCompactEvery) compact()

  /** Snapshot read: the view content as of the absorbed batch whose
    * `upto ≤ seq`. */
  def frameAsOf(seq: Long): DataFrame = {
    val dirs = committedBatchDirs().filter(batchUpto(_) <= seq)
    if (dirs.isEmpty)
      throw new IllegalStateException(s"no committed batch at or before seq=$seq (compacted or empty)")
    mergeDeltas(readDeltas(dirs))
  }

  /** Collapse all committed deltas into one base delta at the current
    * cursor. The manifest cursor never moves; a death after the marker
    * lands is recovered at open by adopting the complete tmp, a death
    * before it leaves every delta intact. */
  def compact(): Unit = {
    val dirs = committedBatchDirs()
    if (dirs.size <= 1) return
    rewriteChain(mergeDeltas(readDeltas(dirs)), dirs)
  }

  /** RETRACTION (takedown) across the whole delta chain: physically
    * remove every feature row matching `cond` — the view-side half of a
    * corpus takedown (the log side is
    * [[graft.core.ParquetLog.retract]]). A retracted document's
    * signatures/hashes must actually leave storage, or a later
    * re-ingest of near-identical content would still dedup against it.
    *
    * Implemented as a FILTERED compaction: the chain collapses into one
    * base delta minus the matching rows, under [[compact]]'s exact
    * crash protocol (tmp → marker → swap; a death at any point recovers
    * to old or new state at open, never partial). The ingest cursor is
    * UNCHANGED — retraction is not an absorb, and replaying the
    * interval would find the rows already gone. Like any compaction it
    * collapses [[frameAsOf]] history to the current state — which for a
    * takedown is the POINT (no snapshot may resurrect the rows). NULL
    * `cond` rows are kept; retracting absent rows is an idempotent
    * rewrite. */
  def retractWhere(cond: org.apache.spark.sql.Column): Unit = {
    val dirs = committedBatchDirs()
    if (dirs.isEmpty) return
    import org.apache.spark.sql.functions.{coalesce, lit}
    val keep = mergeDeltas(readDeltas(dirs)).where(!coalesce(cond, lit(false)))
    if (keep.isEmpty) {
      // TOTAL takedown: there is no base delta to write — a
      // dynamic-partition writeMerged (IVF's per-cell layout) of an
      // empty frame lands a _SUCCESS-only directory that later reads
      // cannot infer a schema from, bricking the view. The retracted
      // state IS "no committed batches": delete the chain (cursor
      // unchanged; the view reads as empty and absorbs continue).
      // Idempotent-completable: a death mid-delete leaves a subset of
      // the rows and a re-run (the family intent replay) finishes it.
      dirs.foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))
    } else rewriteChain(keep, dirs)
  }

  /** The shared tmp → marker → swap rewrite under the compaction crash
    * protocol: collapse `dirs` into one base delta holding `merged`. */
  private def rewriteChain(merged: DataFrame, dirs: Seq[Path]): Unit = {
    if (Files.exists(compactMarker)) Files.delete(compactMarker)
    if (Files.exists(compactTmp)) FsLists.walkDeepestFirst(compactTmp).foreach(Files.delete)
    writeMerged(merged, compactTmp)
    Files.writeString(compactMarker, sinceSeq.toString) // tmp is now the commit point
    dirs.foreach(p => FsLists.walkDeepestFirst(p).foreach(Files.delete))
    Files.move(compactTmp, batchPath(sinceSeq))
    Files.delete(compactMarker)
  }
}
