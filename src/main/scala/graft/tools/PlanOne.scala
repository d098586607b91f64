package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: print the executed plan of one SparkEntry query. */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println("[plan] " + args(0))
    println(p.toString.linesIterator.map(_.take(160)).take(60).mkString("\n"))
    spark.stop()
  }
}
