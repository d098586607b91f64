package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual declared queries in isolation (warm-up on sf0.001,
  * then N timed runs on the target dir). Usage:
  *   runMain graft.tools.TimeQuery <sfDir> <q1> [q2 ...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("TQ_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("TQ_SHUFFLE", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      exec(n, "/root/testdata/sf0.001") // warm-up
      val ts = (1 to 3).map(_ => exec(n, dir))
      println(f"TIMED $n%-24s ${ts.min}%6.2f s (min of 3: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
