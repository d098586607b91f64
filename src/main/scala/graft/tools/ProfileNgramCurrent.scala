package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing of the CURRENT ngramJaccard path (LSH candidates +
  * sig-prefiltered exact verify) on the 3-copy chain fixture. */
object ProfileNgramCurrent {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("TCPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the exact q_dedup_clusters fixture — reuse it so the profiler
    // can't drift from what the query actually runs on
    val corpus = graft.SparkEntry.docsWithDupChain(spark, dir).persist()
    corpus.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (rnd <- 1 to 2) {
      println(s"[prof] --- round $rnd ---")
      val sh = corpus.select(col("doc_id").as("id"), Dedup.hashedShinglesCol(col("text")).as("sh"))
        .where(size(col("sh")) > 0).persist()
      t("shingles")(sh.count())
      val sigs = sh.select(col("id"), Dedup.minhashCol(col("sh"), 64).as("sig")).persist()
      t("sigs")(sigs.count())
      val cand = t("lshCandidates") {
        val c = Dedup.lshCandidatesPublic(sigs, 64, 32, 1000).persist(); c.count(); c
      }
      println(s"[prof] candidates = ${cand.count()}")
      val pre = t("sig prefilter") {
        val p = cand
          .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
          .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
          .where(Dedup.sigMatchesPublic(col("sig_a"), col("sig_b")).cast("double") >= lit((0.5 - 0.25) * 64))
          .select("id_a", "id_b").persist()
        p.count(); p
      }
      println(s"[prof] prefiltered = ${pre.count()}")
      t("exact verify") {
        val v = pre
          .join(sh.select(col("id").as("id_a"), col("sh").as("hs_a")), Seq("id_a"))
          .join(sh.select(col("id").as("id_b"), col("sh").as("hs_b")), Seq("id_b"))
          .where(least(size(col("hs_a")), size(col("hs_b"))).cast("double") >=
            lit(0.499) * greatest(size(col("hs_a")), size(col("hs_b"))).cast("double"))
        v.count()
      }
      Seq(sh, sigs, cand, pre).foreach(_.unpersist())
    }
    spark.stop()
  }
}
