package graft.tools

import graft.ops.{Cluster, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q_dedup_clusters spend its time: pair generation vs the
  * connected-components loop (dev tool). */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("TCPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the exact q_dedup_clusters fixture — reuse it so the profiler
    // can't drift from what the query actually runs on
    val corpus = graft.SparkEntry.docsWithDupChain(spark, dir)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    corpus.count() // warm

    (1 to 2).foreach { round =>
      val pairs = time(s"r$round pairs (ngramJaccard)") {
        val p = Dedup.ngramJaccard(corpus, threshold = 0.5, maxDocFreq = 1000)
        p.count(); p
      }
      time(s"r$round connectedComponents") {
        Cluster.dupClusters(corpus, pairs).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
