package graft.tools
import org.apache.spark.sql.SparkSession
/** Bench with per-query session-state diagnostics: cached RDD count,
  * storage memory, cumulative GC time — to find what accumulates across
  * many queries on the shared session (the bench's own execution shape). */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.SparkEntry.queries.foreach { case (_, fn) =>
      try exec(fn(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => () }
    }
    println(s"[diag] after warmup: rdds=${spark.sparkContext.getPersistentRDDs.size} gcMs=$gcMs tables=${spark.catalog.listTables().count()}")
    var prevGc = gcMs
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try exec(fn(spark, sfDir)) catch { case e: Throwable => println(s"[diag] $name FAILED: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      val g = gcMs
      println(f"[diag] $name%-24s ${dt}%6.2f s  rdds=${spark.sparkContext.getPersistentRDDs.size}%-4d gc+=${g - prevGc}%-6d")
      prevGc = g
    }
    spark.stop()
  }
}
