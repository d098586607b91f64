package graft.streaming

import graft.core.FlumeLog
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import java.nio.file.{Files, Paths}

/** Exactly-once streaming INGESTION into a flume log — the missing
  * direction: everywhere else the log is a source; here a structured
  * stream (another log's tail, a kafka-shaped feed, a file drop) is the
  * producer and the log is the sink, so a whole flume pipeline
  * (log → views) can hang off any upstream stream.
  *
  * foreachBatch is at-least-once: after a crash between a durable
  * `log.append` and the checkpoint commit, the SAME epoch (batchId)
  * replays on restart. Appending it again would duplicate records — the
  * log has no primary key to dedup on, so the sink keeps its own
  * high-water mark: a `_sink_commit` file holding the last appended
  * batchId, written AFTER the append (the delta-before-manifest
  * ordering every durable view here uses). A replayed epoch with
  * `batchId ≤` the stored mark is skipped whole — epochs are
  * deterministic replays of the same offsets, so skip-whole is safe and
  * makes the append path exactly-once.
  *
  * At cluster scale the marker is one tiny object per sink; appends are
  * the log's own batch-atomic directory commits.
  */
object LogSink {

  final class BatchCommitter(log: FlumeLog, commitFile: String) extends Serializable {
    private val path = Paths.get(commitFile)

    private def last: Long =
      if (Files.exists(path)) Files.readString(path).trim.toLong else -1L

    /** Append `batch` unless this epoch already committed. */
    def addBatch(batch: DataFrame, batchId: Long): Unit = {
      if (batchId <= last) return // replayed epoch: already durable in the log
      if (!batch.isEmpty) log.append(batch)
      Files.writeString(path, batchId.toString) // append durable before the mark
    }
  }

  /** Run `stream` into `log`. `commitFile` persists the sink's epoch
    * high-water mark; `checkpointDir` (optional, as everywhere) is the
    * source-offset optimization. */
  def start(
      stream: DataFrame,
      log: FlumeLog,
      commitFile: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val committer = new BatchCommitter(log, commitFile)
    var w = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        committer.addBatch(batch, batchId)
      }
    checkpointDir.foreach(d => w = w.option("checkpointLocation", d))
    w.start()
  }
}
