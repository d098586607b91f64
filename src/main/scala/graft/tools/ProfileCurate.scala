package graft.tools

import graft.ops.{Curate, Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiling of the curate pipeline (dev tool). */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
    docs.count() // warm

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val feats = docs.select(
        col("doc_id"),
        TextAnalysis.qualityCol(col("text")).as("quality"),
        xxhash64(col("text")).as("content_hash"),
        Dedup.hashedShinglesCol(col("text")).as("hs"))
      .persist()
    time("feature pass (materialize)") { feats.count() }

    val qualified = feats.where(col("quality") >= 0.2)
    val exactKeep = qualified.groupBy("content_hash").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val exactKept = qualified.join(exactKeep, Seq("doc_id"), "left_semi")
    val survivors = exactKept.select(col("doc_id").as("id"), col("hs")).where(size(col("hs")) > 0).persist()
    time("quality + exact dedup") { println(s"  survivors: ${survivors.count()}") }

    time("minhash LSH verify b=32 cap=1000") {
      println("  pairs: " + Dedup.minhashLshFromShingles(survivors,
        threshold = 0.6, verifyExact = true, bands = 32, maxBucket = 1000).count())
    }
    time("minhash LSH verify b=32 cap=1000 (2nd)") {
      println("  pairs: " + Dedup.minhashLshFromShingles(survivors,
        threshold = 0.6, verifyExact = true, bands = 32, maxBucket = 1000).count())
    }
    time("full curate (end to end)") {
      Curate.curate(docs, minQuality = 0.2, nearThreshold = 0.6, verifyExact = true,
        bands = 32, maxBucket = 1000).write.format("noop").mode("overwrite").save()
    }

    // sub-stage anatomy of the LSH verify
    val sigs = time("sigs (OPH) materialize") {
      val s2 = survivors.select(col("id"), Dedup.minhashCol(col("hs"), 64).as("sig")).persist()
      s2.count(); s2
    }
    val cand = time("candidates (band group + pairs + distinct)") {
      val c = Dedup.lshCandidatesPublic(sigs, 64, 32, 1000).persist()
      println("  candidates: " + c.count()); c
    }
    val pf = cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .where(size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
        .cast("double") >= lit((0.6 - 0.25) * 64))
    time("sig prefilter (legacy HOF chain)") { println("  post-prefilter: " + pf.count()) }
    val attachOnly = cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
    time("attach sigs only (no filter)") { println("  " + attachOnly.count()) }
    val attachA = cand.join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
    time("attach sig_a only") { println("  " + attachA.count()) }
    time("candidates count only") { println("  " + cand.count()) }
    val pfU = cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .where(Dedup.sigMatchesPublic(col("sig_a"), col("sig_b")).cast("double") >= lit((0.6 - 0.25) * 64))
    time("sig prefilter (native SigAgreement — current)") { println("  " + pfU.count()) }
    spark.stop()
  }
}
