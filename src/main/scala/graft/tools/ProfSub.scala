package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfSub {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
    val k = 15
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val grams = docs
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - lit(k - 1)),
        i => struct(i.cast("long").as("pos"),
          xxhash64(concat_ws(" ", slice(col("tk"), i, lit(k)))).as("g")))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    time("gram explode only (count)") { grams.write.format("noop").mode("overwrite").save() }
    time("gram agg min/max") {
      grams.groupBy("g").agg(min("doc_id"), max("doc_id")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
