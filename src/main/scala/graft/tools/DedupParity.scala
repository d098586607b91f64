package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch check: LSH-candidates ngramJaccard must equal the exhaustive
  * inverted-index path on the dedup fixture. */
object DedupParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- args) {
      val dir = s"/root/testdata/$sf"
      val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val docs = d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val t0 = System.nanoTime()
      val ex = graft.ops.Dedup.ngramJaccard(docs, threshold = 0.5, maxDocFreq = 1000, exhaustive = true)
        .collect().map(key).toSet
      val t1 = System.nanoTime()
      val lsh = graft.ops.Dedup.ngramJaccard(docs, threshold = 0.5, maxDocFreq = 1000)
        .collect().map(key).toSet
      val t2 = System.nanoTime()
      println(f"[parity] $sf exhaustive=${ex.size} (${(t1-t0)/1e9}%.2f s) lsh=${lsh.size} (${(t2-t1)/1e9}%.2f s) " +
        s"equal=${ex == lsh} onlyEx=${(ex -- lsh).take(5)} onlyLsh=${(lsh -- ex).take(5)}")
    }
    spark.stop()
  }
}
