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
    new LogStreamTable(schema, properties.get("logId"))
}

class LogStreamTable(schema: StructType, logId: String) extends Table with SupportsRead {
  override def name(): String = s"graft-log-$logId"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new LogMicroBatchStream(logId, schema)
        override def toBatch: Batch = new LogBatch(logId, schema, None, None)
      }
    }
}

/** Plans each micro-batch as the (start, end] seq slice of the log,
  * split into `parallelism` contiguous sub-ranges. Rows are serialized to
  * UnsafeRow at plan time (local-mode logs are driver-resident; partition
  * payloads stay small because a batch is only the delta). */
class LogMicroBatchStream(logId: String, schema: StructType) extends MicroBatchStream {
  private def log = LogStreamRegistry.get(logId)

  override def latestOffset(): Offset = SeqOffset(log.since)
  override def initialOffset(): Offset = SeqOffset(-1L)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    LogBatch.plan(log, schema,
      Some(start.asInstanceOf[SeqOffset].seq), Some(end.asInstanceOf[SeqOffset].seq))

  override def createReaderFactory(): PartitionReaderFactory = new LogPartitionReaderFactory
}

/** Batch-mode scan of the same table (so the source is usable with
  * `spark.read` too). */
class LogBatch(logId: String, schema: StructType, gt: Option[Long], lte: Option[Long]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    LogBatch.plan(LogStreamRegistry.get(logId), schema, gt, lte)
  override def createReaderFactory(): PartitionReaderFactory = new LogPartitionReaderFactory
}

object LogBatch {
  def plan(log: FlumeLog, schema: StructType, gt: Option[Long], lte: Option[Long]): Array[InputPartition] = {
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
    val rows = df.orderBy(col(log.seqCol)).collect()
    if (rows.isEmpty) return Array.empty
    val ser = ExpressionEncoder(schema).createSerializer()
    val internal = rows.map(r => ser(r).copy().asInstanceOf[InternalRow])
    val slices = math.min(4, internal.length)
    internal.grouped(math.max(1, math.ceil(internal.length.toDouble / slices).toInt))
      .map(g => LogInputPartition(g.toArray): InputPartition).toArray
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
