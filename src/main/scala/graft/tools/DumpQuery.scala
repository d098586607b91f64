package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: dump one SparkEntry query result to parquet for offline diff. */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(args(0))(spark, args(1)).write.mode("overwrite").parquet(args(2))
    spark.stop()
  }
}
