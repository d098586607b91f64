package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Scratch stage profile of the ngram LSH path at bench config. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("TCPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 10000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))).persist()
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val perms = 64; val bands = 32; val rows = perms / bands
    val oph = udf { hs: Seq[Long] =>
      val sig = Array.fill[Long](perms)(Long.MaxValue)
      hs.foreach { h =>
        val b = ((h % perms) + perms) % perms
        val m = java.lang.Long.rotateLeft(h, 21) * 0x9e3779b97f4a7c15L
        if (m < sig(b.toInt)) sig(b.toInt) = m
      }
      var i = 0
      while (i < perms) {
        if (sig(i) == Long.MaxValue) {
          var j = (i + 1) % perms; var hops = 1
          while (sig(j) == Long.MaxValue && hops < perms) { j = (j + 1) % perms; hops += 1 }
          sig(i) = if (sig(j) == Long.MaxValue) 0L else sig(j) + hops
        }
        i += 1
      }
      sig.toSeq
    }
    for (rnd <- 1 to 2) {
      println(s"[prof] --- round $rnd ---")
      val sh = docs.select(col("doc_id").as("id"), graft.ops.Dedup.hashedShinglesCol(col("text")).as("hs"))
        .where(size(col("hs")) > 0).persist()
      t("shingles")(sh.count())
      val sigs = sh.select(col("id"), oph(col("hs")).as("sig")).persist()
      t("sigs")(sigs.count())
      val banded = sigs.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(concat_ws(",", transform(slice(col("sig"), b * rows + 1, rows), _.cast("string"))))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
      val capped = banded.withColumn("bucket_n", count(lit(1)).over(
          Window.partitionBy("band", "bandhash")))
        .where(col("bucket_n") <= 1000).drop("bucket_n").persist()
      t("band+capwindow")(capped.count())
      val l = capped.select(col("band"), col("bandhash"), col("id").as("id_a"))
      val r = capped.select(col("band"), col("bandhash"), col("id").as("id_b"))
      val cand = l.join(r, Seq("band", "bandhash")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().persist()
      val nc = t("cand join+distinct")(cand.count())
      println(s"[prof] candidates = $nc")
      val verified = cand
        .join(sh.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("j", round(size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double"), 4))
        .where(col("j") >= 0.5).select("id_a", "id_b", "j")
      t("verify+checkpoint")(verified.localCheckpoint(true))
      Seq(sh, sigs, capped, cand).foreach(_.unpersist())
    }
    spark.stop()
  }
}
