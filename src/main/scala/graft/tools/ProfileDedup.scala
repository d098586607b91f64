package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiling of the dedup pipelines (dev tool). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // warm
    docs.count()

    time("tokenize") {
      docs.select(size(graft.ops.TextAnalysis.tokens(col("text"))).as("n")).agg(sum("n")).collect()
    }
    time("shingles+hash count") {
      docs.select(explode(graft.ops.Dedup.shingles(col("text"))).as("s")).select(xxhash64(col("s"))).count()
    }
    time("full minhashLsh") {
      Dedup.minhashLsh(docs, threshold = 0.35).write.format("noop").mode("overwrite").save()
    }
    time("full minhashLsh 2nd") {
      Dedup.minhashLsh(docs, threshold = 0.35).write.format("noop").mode("overwrite").save()
    }
    time("full ngramJaccard") {
      Dedup.ngramJaccard(docs, threshold = 0.5, maxDocFreq = 1000)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
