package graft.tools

import graft.core.MemoryLog
import graft.streaming.{StreamingViewRunner, StreamingViews}
import graft.views.{MergeableReduceView, Stats, StatsReduceView}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** End-to-end streaming walkthrough: live tail via the seq-offset custom
  * source, a streaming-maintained reduce view, appends landing mid-stream. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(StructField("value", DoubleType)))
    val log = new MemoryLog(spark, schema)
    log.appendRows(Seq(Row(1.0), Row(2.0)))

    val tail = log.readStream.writeStream.format("memory")
      .queryName("live").outputMode(OutputMode.Append()).start()
    val view = StatsReduceView("value").create(null, "stats").asInstanceOf[MergeableReduceView[Stats]]
    val runner = new StreamingViewRunner(log, view)

    tail.processAllAvailable(); runner.awaitParity()
    println(s"[demo] after initial 2 appends: live rows=${spark.sql("SELECT * FROM live").count()}, " +
      s"view since=${view.since}, mean=${view.value.map(_.mean)}")

    log.appendRows(Seq(Row(6.0)))
    tail.processAllAvailable(); runner.awaitParity()
    println(s"[demo] after live append:      live rows=${spark.sql("SELECT * FROM live").count()}, " +
      s"view since=${view.since}, mean=${view.value.map(_.mean)}")

    tail.stop(); runner.stop(); spark.stop()
  }
}
