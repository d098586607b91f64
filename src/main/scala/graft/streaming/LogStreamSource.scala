package graft.streaming

import graft.core.FlumeLog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-JVM registry handing logs to the streaming source (local mode: the
  * driver and executors share the JVM; a cluster deployment would use the
  * parquet-directory log with the file streaming source instead — this
  * source exists to give MEMORY logs flume's record-granular live tail). */
object LogStreamRegistry {
  private val logs = TrieMap.empty[String, FlumeLog]
  private val ids = new AtomicLong()
  def register(log: FlumeLog): String = {
    val id = s"log-${ids.incrementAndGet()}"
    logs.put(id, log); id
  }
  def get(id: String): FlumeLog =
    logs.getOrElse(id, throw new NoSuchElementException(s"no registered log '$id'"))
  /** Streams unregister on stop — a long-lived session starting many
    * tails must not pin every log instance for the JVM lifetime. */
  def unregister(id: String): Unit = logs.remove(id)
}

/** Seq-granular offset: flume's `since` as a streaming offset.
  * (`/root/reference/README.md:197-201` — the log cursor IS the stream
  * position; -1 = empty.) */
case class SeqOffset(seq: Long) extends Offset {
  override def json: String = seq.toString
}

/** Micro-batch streaming source over a [[FlumeLog]] with offsets in seq
  * space — the "custom source" of the north-star approach. The reference
  * view-build loop streams `{gt: upto, live: true}`
  * (`/root/reference/index.js:39`); here each micro-batch is exactly the
  * seq interval (start, end], so restart/checkpoint recovery is
  * record-precise rather than file-granular.
  *
  * Usage: `spark.readStream.format("graft.streaming.LogStreamProvider")
  * .option("logId", LogStreamRegistry.register(log)).load()`
  */
class LogStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val log = LogStreamRegistry.get(options.get("logId"))
    log.read.schema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LogStreamTable(schema, properties.get("logId"),
      Option(properties.get("startSeq")).map(_.toLong).getOrElse(-1L))
}

class LogStreamTable(schema: StructType, logId: String, startSeq: Long = -1L)
    extends Table with SupportsRead {
  override def name(): String = s"graft-log-$logId"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // column pruning is LOAD-BEARING for media logs: without it every
      // control query on the tail (the curator's max(seq) fence, seq
      // traces) decodes each row's full binary content — the parquet
      // projection below skips those pages entirely
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          LogStreamRegistry.get(logId) match {
            case p: graft.core.ParquetLog =>
              new ParquetLogMicroBatchStream(logId, p, schema, startSeq, required)
            case _ => new LogMicroBatchStream(logId, schema, startSeq, required)
          }
        override def toBatch: Batch = new LogBatch(logId, schema, None, None, required)
      }
    }
}

/** Plans each micro-batch as the (start, end] seq slice of the log,
  * split into `parallelism` contiguous sub-ranges. Rows are serialized to
  * UnsafeRow at plan time (local-mode logs are driver-resident; partition
  * payloads stay small because a batch is only the delta). */
class LogMicroBatchStream(logId: String, schema: StructType, startSeq: Long = -1L,
    required: StructType = null)
    extends MicroBatchStream {
  private def log = LogStreamRegistry.get(logId)
  private def out: StructType = if (required == null) schema else required

  override def latestOffset(): Offset = SeqOffset(log.since)
  /** A live tail from `{gt: N}` starts AT N — a seek, not a scan+filter
    * (`/root/reference/index.js:39`); only consulted when the query has
    * no checkpoint yet. */
  override def initialOffset(): Offset = SeqOffset(startSeq)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = LogStreamRegistry.unregister(logId)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    LogBatch.plan(log, out,
      Some(start.asInstanceOf[SeqOffset].seq), Some(end.asInstanceOf[SeqOffset].seq))

  override def createReaderFactory(): PartitionReaderFactory = new LogPartitionReaderFactory
}

/** Batch-mode scan of the same table (so the source is usable with
  * `spark.read` too). */
class LogBatch(logId: String, schema: StructType, gt: Option[Long], lte: Option[Long],
    required: StructType = null) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    LogBatch.plan(LogStreamRegistry.get(logId),
      if (required == null) schema else required, gt, lte)
  override def createReaderFactory(): PartitionReaderFactory = new LogPartitionReaderFactory
}

object LogBatch {
  def plan(log: FlumeLog, out: StructType, gt: Option[Long], lte: Option[Long]): Array[InputPartition] = {
    import org.apache.spark.sql.functions.col
    // This planner collects the delta to the driver — correct only for a
    // log whose data is already driver-resident. Anything table-backed
    // must use a partition-planned source (ParquetLog's file source);
    // materializing a 100 TB table here would be a silent scale-killer.
    require(log.isInstanceOf[graft.core.MemoryLog],
      s"seq-offset source only plans MemoryLog deltas; ${log.getClass.getSimpleName} " +
        "must provide a partition-planned streaming source")
    var df = log.read
    gt.foreach(v => df = df.where(col(log.seqCol) > v))
    lte.foreach(v => df = df.where(col(log.seqCol) <= v))
    // pruned output: serialize only the required columns (order kept)
    val rows = df.orderBy(col(log.seqCol))
      .select(out.fieldNames.toSeq.map(n => col(s"`$n`")): _*).collect()
    if (rows.isEmpty) return Array.empty
    val ser = ExpressionEncoder(out).createSerializer()
    val internal = rows.map(r => ser(r).copy().asInstanceOf[InternalRow])
    val slices = math.min(4, internal.length)
    internal.grouped(math.max(1, math.ceil(internal.length.toDouble / slices).toInt))
      .map(g => LogInputPartition(g.toArray): InputPartition).toArray
  }
}

/** Record-granular live tail for the DURABLE log: each micro-batch is
  * the exact seq interval (start, end], planned as one reader per
  * overlapping parquet FILE — the build-loop semantics of the reference
  * (`/root/reference/index.js:39`, `stream({gt: upto, live: true})`) at
  * seq precision on the recommended production log
  * (`/root/reference/README.md:85`).
  *
  * No driver collect anywhere: planning touches only METADATA — the
  * directory listing (pruned to the seq-bucket directories intersecting
  * the batch interval on a bucketed log) and per-file footers (min/max
  * seq, cached for the stream's lifetime since log files are immutable
  * once written). Readers decode parquet directly on the executor with a
  * row-group + record filter on the seq range, so a batch reads the
  * delta's bytes and nothing else. At cluster scale the footer cache
  * becomes a manifest table; the planner shape is unchanged.
  */
class ParquetLogMicroBatchStream(
    logId: String,
    log: graft.core.ParquetLog,
    schema: StructType,
    startSeq: Long = -1L,
    required: StructType = null) extends MicroBatchStream {

  ParquetSliceReader.requireSupported(schema)
  private def out: StructType = if (required == null) schema else required

  // file → (minSeq, maxSeq); log files never change once written, so a
  // footer is read at most once per stream lifetime
  private val footerBounds = TrieMap.empty[String, (Long, Long)]

  override def latestOffset(): Offset = SeqOffset(log.since)
  /** A live tail from `{gt: N}` starts AT N: the skipped prefix is never
    * listed, never footer-read, never decoded — the seek semantics of
    * the reference's `stream({gt, live: true})`. Only consulted when
    * the query has no checkpoint yet. */
  override def initialOffset(): Offset = SeqOffset(startSeq)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  // a planned batch's readers hold planned file paths until the batch
  // commits — ParquetLog.retract's quiescence fence (it must not swap a
  // bucket out from under an in-flight batch). Cleared at commit and at
  // stream stop (a stopped query never runs its planned tasks).
  override def commit(end: Offset): Unit = log.inflightTailBatches.remove(logId)
  override def stop(): Unit = {
    log.inflightTailBatches.remove(logId)
    LogStreamRegistry.unregister(logId)
  }

  private def listParquet(f: java.io.File, lower: Long, upper: Long): Seq[java.io.File] = {
    val fs = f.listFiles()
    if (fs == null) Seq.empty
    else fs.toSeq.flatMap {
      case d if d.isDirectory =>
        val name = d.getName
        // a concurrent append's in-flight commit dir must never be
        // planned (its files are incomplete; their seqs are beyond this
        // batch's end anyway)
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        // bucketed layout: prune whole seq_bucket=N directories that
        // cannot intersect (start, end] — plan-time partition pruning
        else if (name.startsWith("seq_bucket=") && log.bucketSizeOpt.exists(_ > 0)) {
          val b = name.stripPrefix("seq_bucket=").toLong
          val bs = log.bucketSizeOpt.get
          if (b >= lower / bs && b <= upper / bs) listParquet(d, lower, upper) else Seq.empty
        } else listParquet(d, lower, upper)
      case p if p.getName.endsWith(".parquet") &&
        !p.getName.startsWith(".") && !p.getName.startsWith("_") => Seq(p)
      case _ => Seq.empty
    }
  }

  /** Footer bounds of a LISTED log file. A visible `part-*.parquet` in
    * final position is always fully committed (every write path here is
    * committer-mediated: task files live under `_temporary/`/dot names
    * — which [[listParquet]] excludes — until an atomic rename), so an
    * unreadable footer is TRANSIENT INFRASTRUCTURE (fd pressure, a
    * checksum sidecar racing its rename), never "a file that is not
    * ours yet". The pre-r17 version returned None here and the planner
    * skipped the file for the batch — SILENT RECORD LOSS: the committed
    * offset interval advanced past the skipped file's rows forever.
    * That was the real curator-takedown flake (r15 → r17: a re-upload
    * vanishing with a clean store, an advanced cursor, and — the r17
    * discriminators — no decode forensic marker and rehash-now fine:
    * the row never entered the batch at all). Now: retry briefly, then
    * THROW — a batch must fail loudly and replan rather than silently
    * lose records; a file that stays unreadable is log corruption, not
    * something to skip. */
  private def bounds(path: String): (Long, Long) =
    footerBounds.getOrElseUpdate(path, {
      var attempt = 0
      var out: Option[(Long, Long)] = None
      var last: Throwable = null
      while (out.isEmpty && attempt < 6) {
        try out = Some(ParquetSliceReader.seqBounds(path, log.seqCol))
        catch {
          case scala.util.control.NonFatal(e) =>
            last = e; attempt += 1
            if (attempt < 6) Thread.sleep(25L * attempt)
        }
      }
      out.getOrElse(throw new java.io.IOException(
        s"seq-offset planner: footer of committed log file $path unreadable after " +
          s"$attempt attempts — failing the batch rather than silently skipping " +
          "its rows (a skipped file's seqs would fall out of the committed " +
          "offset interval forever)", last))
    })

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val gt = start.asInstanceOf[SeqOffset].seq
    val lte = end.asInstanceOf[SeqOffset].seq
    if (lte <= gt) return Array.empty
    log.inflightTailBatches.add(logId)
    // Atomic w.r.t. compact()'s directory swap: compact holds the log
    // monitor across rewrite + rename, so a listing taken under the same
    // monitor sees the pre-compact layout or the post-compact layout,
    // never the empty mid-swap gap (which would silently plan zero rows
    // for a committed offset range — data loss).
    log.synchronized {
      val parts = listParquet(new java.io.File(log.dir), gt + 1, lte)
        .map(_.getPath)
        .flatMap { p =>
          val (lo, hi) = bounds(p)
          if (hi > gt && lo <= lte) {
            // clip the batch interval to THIS file's footer range: log
            // files carry pairwise-disjoint seq ranges, so the clipped
            // intervals partition the batch — and if compaction deletes
            // the file before the task runs, the reader re-resolves
            // exactly its own share from the rewritten layout with no
            // overlap against sibling partitions
            val gtEff = if (lo == Long.MinValue || lo - 1 < gt) gt else lo - 1
            val lteEff = math.min(lte, hi)
            Some(ParquetSlicePartition(p, gtEff, lteEff, log.dir))
          } else None
        }
        .sortBy(_.gt)
      if (java.lang.Boolean.getBoolean("graft.debug.batchTrace"))
        System.err.println(s"[graft-trace] plan ($gt,$lte] -> " +
          parts.map(p => s"${new java.io.File(p.file).getName}:(${p.gt},${p.lte}]")
            .mkString(" ") + s" (cursor=${log.since})")
      parts.map(p => p: InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ParquetSliceReaderFactory(out, log.seqCol)
}

/** One parquet file's slice of a micro-batch: rows with seq ∈ (gt, lte],
  * where (gt, lte] is already clipped to the file's footer seq range.
  * `dir` is the log root, carried so the reader can re-resolve its
  * interval if a compaction rewrote the layout after planning. */
case class ParquetSlicePartition(file: String, gt: Long, lte: Long, dir: String)
    extends InputPartition

class ParquetSliceReaderFactory(schema: StructType, seqCol: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ParquetSlicePartition]
    new ParquetSliceReader(p, schema, seqCol)
  }
}

/** Executor-side parquet decode of one file with a pushed seq-range
  * filter (row groups skipped by min/max stats, records filtered by the
  * predicate) — the reader never materializes out-of-range rows — and a
  * pushed COLUMN PROJECTION: `schema` here is the scan's REQUIRED
  * output (Spark's pruneColumns), and the parquet read schema is the
  * file's own MessageType filtered to those columns (+ the seq column,
  * which the record filter and the defensive range check need), so a
  * `max(seq)` over a media log never decodes a content byte.
  *
  * Compaction resilience: the planned file is the fast path. If a
  * [[graft.core.ParquetLog.compact]] rewrote the log between planning
  * and execution the file is gone but its rows are not — the partition's
  * clipped (gt, lte] interval is re-resolved against the log directory's
  * CURRENT files. Planned partitions carry disjoint intervals, so the
  * fallback neither duplicates nor drops records, which is what lets a
  * live tail and compaction coexist. */
class ParquetSliceReader(part: ParquetSlicePartition, schema: StructType, seqCol: String)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.filter2.compat.FilterCompat
  import org.apache.parquet.filter2.predicate.FilterApi
  import org.apache.parquet.example.data.Group

  private val pred = FilterApi.and(
    FilterApi.gt(FilterApi.longColumn(seqCol), java.lang.Long.valueOf(part.gt)),
    FilterApi.ltEq(FilterApi.longColumn(seqCol), java.lang.Long.valueOf(part.lte)))

  // physical projection: the required output columns plus the seq column
  private val physicalNames: Set[String] = schema.fieldNames.toSet + seqCol

  // per-opened-file name→index maps into the PROJECTED group (projection
  // preserves the file's field order, which may differ from the output's)
  private var groupIdx: Array[Int] = _
  private var seqIdx: Int = _

  private def open(path: String): org.apache.parquet.hadoop.ParquetReader[Group] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fileType = {
      val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hPath, conf))
      try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    }
    import scala.jdk.CollectionConverters._
    val kept = fileType.getFields.asScala.filter(f => physicalNames.contains(f.getName))
    val projected = new org.apache.parquet.schema.MessageType(fileType.getName, kept.asJava)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA, projected.toString)
    groupIdx = schema.fieldNames.map(projected.getFieldIndex)
    seqIdx = projected.getFieldIndex(seqCol)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), hPath)
      .withConf(conf)
      .withFilter(FilterCompat.get(pred))
      .build()
  }

  private var paths: List[String] = List(part.file)
  private var fellBack = false
  private var reader: org.apache.parquet.hadoop.ParquetReader[Group] = null
  private var row: Group = _

  /** Open the next file, falling back to interval re-resolution exactly
    * once if the planned file vanished under a compaction. A fallback
    * file vanishing too (a second compaction mid-read) fails the task;
    * Spark's task retry re-resolves from scratch. */
  private def advanceReader(): Boolean = paths match {
    case p :: rest =>
      paths = rest
      if (reader != null) { reader.close(); reader = null }
      try { reader = open(p); true }
      catch {
        case _: java.io.FileNotFoundException if !fellBack =>
          fellBack = true
          paths = ParquetSliceReader.resolveInterval(part.dir, seqCol, part.gt, part.lte)
          advanceReader()
      }
    case Nil => false
  }

  override def next(): Boolean = {
    if (reader == null && !advanceReader()) return false
    row = reader.read()
    // parquet's record-level filter drops out-of-range rows already; the
    // loop guards against readers configured without record filtering
    while (row != null && {
      val s = row.getLong(seqIdx, 0); s <= part.gt || s > part.lte
    }) row = reader.read()
    if (row == null) { if (advanceReader()) next() else false } else true
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(schema.fields.indices.map(i =>
      ParquetSliceReader.readField(row, groupIdx(i), schema.fields(i).dataType)))

  override def close(): Unit = if (reader != null) reader.close()
}

object ParquetSliceReader {
  import org.apache.spark.sql.types._
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.LogicalTypeAnnotation

  /** Payload shapes this reader decodes: primitives, STRUCTS of them
    * (recursively), and ARRAYS of primitives — which covers every graft
    * log schema (media rows carry a `meta` struct, embedding rows an
    * `array<float>`). The coverage is LOAD-BEARING, not convenience:
    * the r15→r17 curator-takedown flake was media logs silently
    * falling back to the parquet FILE streaming source, whose
    * file-granular batches can SPLIT one append and deliver its files
    * out of seq order when the tail polls during the append's commit —
    * the later-seq file's batch advances the curator cursor, and the
    * earlier-seq file's batch then reads as a replay and is skipped:
    * permanent silent record loss. The seq-offset source is immune by
    * construction (offsets are seq intervals; a batch is exactly its
    * interval), so every schema a curator tails must decode HERE. A
    * payload outside these shapes (maps, arrays of structs) still
    * throws — and its caller must not tail a log it appends to
    * concurrently. */
  def requireSupported(schema: StructType): Unit = schema.fields.foreach { f =>
    def check(name: String, dt: DataType, insideArray: Boolean): Unit = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
           BooleanType | StringType | BinaryType | TimestampType | DateType => ()
      case st: StructType if !insideArray =>
        st.fields.foreach(g => check(s"$name.${g.name}", g.dataType, insideArray = false))
      case ArrayType(et, _) if !insideArray => check(s"$name[]", et, insideArray = true)
      case other => throw new UnsupportedOperationException(
        s"seq-offset parquet source supports primitives, structs, and arrays of " +
          s"primitives; column '$name' is $other — use ParquetLog.readStreamFiles " +
          "(file streaming source) for such payloads, and never tail a log that " +
          "is appended concurrently through it (file-granular batches can split " +
          "an append out of seq order)")
    }
    check(f.name, f.dataType, insideArray = false)
  }

  /** Re-resolve a seq interval against a log directory's current files —
    * the executor-side fallback when a planned file was deleted by a
    * compaction between planning and execution. Lists the tree, keeps
    * files whose footer range overlaps (gt, lte], in seq order. The
    * interval's rows are known to exist (the offset was committed against
    * a durable cursor), so an empty resolution can only be compact's
    * two-rename swap window — retry briefly, then fail the task rather
    * than silently drop records. */
  def resolveInterval(dir: String, seqCol: String, gt: Long, lte: Long): List[String] = {
    def walk(f: java.io.File): List[java.io.File] = {
      val fs = f.listFiles()
      if (fs == null) Nil
      else fs.toList.flatMap {
        case d if d.isDirectory =>
          if (d.getName.startsWith("_") || d.getName.startsWith(".")) Nil else walk(d)
        case p if p.getName.endsWith(".parquet") &&
          !p.getName.startsWith(".") && !p.getName.startsWith("_") => List(p)
        case _ => Nil
      }
    }
    // a visible part file is always fully committed (committer-mediated
    // writes; dot/underscore staging excluded by walk) — an unreadable
    // footer is transient infrastructure, retried per ATTEMPT; a file
    // that stays unreadable after the retry loop fails the task rather
    // than silently dropping its share of the interval (the same
    // no-silent-skip rule as the planner's `bounds`)
    def attempt(strict: Boolean): List[String] =
      walk(new java.io.File(dir)).flatMap { p =>
        try {
          val (lo, hi) = seqBounds(p.getPath, seqCol)
          if (hi > gt && lo <= lte) List((lo, p.getPath)) else Nil
        } catch {
          case scala.util.control.NonFatal(e) =>
            if (strict) throw new java.io.IOException(
              s"seq interval ($gt, $lte]: footer of committed log file ${p.getPath} " +
                "unreadable after retries — failing the task rather than silently " +
                "dropping its rows", e)
            throw RetryResolve
        }
      }.sortBy(_._1).map(_._2)
    var out: Option[List[String]] = None
    var tries = 0
    while (out.isEmpty && tries < 20) {
      try {
        val r = attempt(strict = tries == 19)
        if (r.isEmpty) { Thread.sleep(50); tries += 1 } // mid-swap gap: retry
        else out = Some(r)
      } catch { case RetryResolve => Thread.sleep(50); tries += 1 }
    }
    out.getOrElse(throw new java.io.FileNotFoundException(
      s"seq interval ($gt, $lte] unresolvable under $dir after compaction"))
  }

  /** Control-flow marker for [[resolveInterval]]'s per-attempt retry. */
  private object RetryResolve extends scala.util.control.ControlThrowable

  /** (min, max) of the seq column from the file footer — metadata only. */
  def seqBounds(path: String, seqCol: String): (Long, Long) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks
      var lo = Long.MaxValue; var hi = Long.MinValue
      blocks.forEach { b =>
        b.getColumns.forEach { c =>
          if (c.getPath.toDotString == seqCol && c.getStatistics != null && !c.getStatistics.isEmpty) {
            c.getStatistics.genericGetMin match {
              case l: java.lang.Long => lo = math.min(lo, l); case _ => lo = Long.MinValue
            }
            c.getStatistics.genericGetMax match {
              case l: java.lang.Long => hi = math.max(hi, l); case _ => hi = Long.MaxValue
            }
          }
        }
      }
      if (lo == Long.MaxValue) (Long.MinValue, Long.MaxValue) else (lo, hi)
    } finally r.close()
  }

  /** Group field → Catalyst internal value (UTF8String / micros / days;
    * structs recurse to InternalRow, arrays of primitives to
    * GenericArrayData — the shapes [[requireSupported]] admits). */
  def readField(g: Group, i: Int, dt: DataType): Any = {
    if (g.getFieldRepetitionCount(i) == 0) return null
    dt match {
      case st: StructType =>
        val g2 = g.getGroup(i, 0)
        InternalRow.fromSeq(st.fields.indices.map(j => readField(g2, j, st.fields(j).dataType)))
      case ArrayType(et, _) =>
        // Spark's standard 3-level LIST: group (LIST) { repeated group
        // list { optional element } } — walk the repeated inner group
        val lst = g.getGroup(i, 0)
        val n = lst.getFieldRepetitionCount(0)
        val arr = new Array[Any](n)
        var k = 0
        while (k < n) {
          arr(k) = readField(lst.getGroup(0, k), 0, et)
          k += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
      case LongType    => g.getLong(i, 0)
      case IntegerType => g.getInteger(i, 0)
      case ShortType   => g.getInteger(i, 0).toShort
      case ByteType    => g.getInteger(i, 0).toByte
      case DoubleType  => g.getDouble(i, 0)
      case FloatType   => g.getFloat(i, 0)
      case BooleanType => g.getBoolean(i, 0)
      case StringType  => org.apache.spark.unsafe.types.UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case BinaryType  => g.getBinary(i, 0).getBytes
      case DateType    => g.getInteger(i, 0)
      case TimestampType =>
        // Spark internal timestamps are micros since epoch. Spark writes
        // INT96 (Julian day + nanos-of-day) by default; INT64 carries a
        // logical unit annotation.
        val pt = g.getType.getType(i).asPrimitiveType()
        if (pt.getPrimitiveTypeName == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96) {
          val bytes = g.getInt96(i, 0).getBytes // 8B nanos-of-day LE + 4B julian day LE
          val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanosOfDay = buf.getLong
          val julianDay = buf.getInt
          (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
        } else {
          val v = g.getLong(i, 0)
          g.getType.getType(i).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
                case LogicalTypeAnnotation.TimeUnit.MICROS => v
                case LogicalTypeAnnotation.TimeUnit.NANOS  => v / 1000L
              }
            case _ => v
          }
        }
      case other => throw new UnsupportedOperationException(s"unsupported type $other")
    }
  }
}

case class LogInputPartition(rows: Array[InternalRow]) extends InputPartition

class LogPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[LogInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}
