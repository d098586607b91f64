package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off 10× scale probe (round-13 verdict #4): generates sf1-SHAPED
  * documents (50k rows) and embeddings (20k rows) — scratch data under
  * /tmp, NOT committed testdata — and times the dedup / sweep / ANN
  * families on sf0.1 vs the generated sf1, reporting wall ratios plus
  * whether the scale guards actually ENGAGE at non-toy size (hot-bucket
  * drop counts, df-cap drop counts, the incremental fence's key count
  * vs its 4M flip point). Findings land in SCALING.md §"Round-13 scale
  * probe".
  *
  * The generator mirrors the driver fixture's shape: the SAME 31-word
  * vocabulary (read from the sf0.1 table, uniform draw), lengths in the
  * same [44, 577]-char band, embeddings 64-dim from the repo's standard
  * multiply + double-xor-fold mixer. Deterministic (seeded per row), so
  * reruns probe identical data. */
object ScaleProbe {
  private def mix(a: Long): Long = { val m = a * 2654435761L; m ^ (m >> 15) ^ (m >> 30) }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sf01 = "/root/testdata/sf0.1"
    val docPath = s"$outDir/documents.parquet"
    val embPath = s"$outDir/embeddings.parquet"

    // ---- generate sf1-shaped tables (idempotent) ----
    if (!new java.io.File(docPath).exists()) {
      val vocab = spark.read.parquet(s"$sf01/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "").distinct().collect().map(_.getString(0)).sorted
      val nDocs = 50000L
      val docRdd = spark.range(nDocs).rdd.map { i =>
        val target = 44 + (math.abs(mix(i * 7919L + 3)) % 534).toInt
        val sb = new StringBuilder
        var j = 0L
        while (sb.length < target) {
          if (sb.nonEmpty) sb.append(' ')
          sb.append(vocab((math.abs(mix(i * 131071L + j * 8191L + 17)) % vocab.length).toInt))
          j += 1
        }
        Row(i, sb.toString, Seq("en", "zh", "de", "fr", "es")((i % 5).toInt),
          s"src${i % 20}", sb.length.toLong)
      }
      spark.createDataFrame(docRdd, StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
        .write.mode("overwrite").parquet(docPath)
      val nVecs = 20000L
      val embRdd = spark.range(nVecs).rdd.map { i =>
        val v = (0 until 64).map(d => ((math.abs(mix(i * 524287L + d * 4099L + 7)) % 2000) - 1000) / 1000.0f)
        Row(i, v, (i % 10).toInt)
      }
      spark.createDataFrame(embRdd, StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType))))
        .write.mode("overwrite").parquet(embPath)
      println(s"[probe] generated $nDocs docs / $nVecs vecs under $outDir")
    }

    def docsOf(dir: String) = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def embOf(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    // each family: the SAME code at both scales; df caps that are
    // corpus-relative scale with the corpus (the operational rule —
    // SCALING.md "knobs expected to change")
    def families(dir: String, label: String): Unit = {
      val docs = docsOf(dir)
      val emb = embOf(dir)
      val nDocs = docs.count(); val nVecs = emb.count()
      val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
      val docsND = docs.unionByName(perturbed)
      val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]

      results("minhash_selfdup") = time {
        graft.ops.Dedup.minhashLsh(docsND, threshold = 0.5, maxBucket = 1000).count()
      }
      results("minhash_incremental") = time {
        val batch = perturbed.where(col("doc_id") % 10 === 0)
        graft.ops.Dedup.minhashLshIncremental(batch, docs, threshold = 0.5, maxBucket = 1000).count()
      }
      results("containment") = time {
        val quotes = docs.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat_ws(" ", slice(graft.ops.TextAnalysis.tokens(col("text")), 1, 25)).as("text"))
        graft.ops.Dedup.containment(docs.unionByName(quotes),
          threshold = 0.8, maxDocFreq = (nDocs / 25).toInt).count()
      }
      results("audio_sweep") = time {
        val corpus = graft.ops.Multimodal.syntheticWavMedia(docs, textured = true)
          .unionByName(graft.ops.Multimodal.syntheticWavClip(docs, gain = 2))
        graft.ops.Multimodal.audioContainmentSweep(corpus).count()
      }
      results("embed_neardup") = time {
        val copies = emb.where(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000).as("vec_id"),
            transform(col("embedding"), x => (x * lit(1.001)).cast("float")).as("embedding"))
        graft.ops.Dedup.embeddingNearDup(emb.unionByName(copies)).count()
      }
      results("ann_ivf_batch") = time {
        graft.ops.Similarity.ivfSearchBatch(emb, emb.where(col("vec_id") < 8), 5).count()
      }
      results("semdedup") = time {
        graft.ops.Dedup.semanticDedup(emb, nCells = math.max(16, (nVecs / 125).toInt)).count()
      }
      results.foreach { case (k, (sec, n)) =>
        println(f"""[probe] {"scale":"$label","family":"$k","sec":$sec%.2f,"rows":$n}""")
      }

      // ---- guard engagement, measured directly at this scale ----
      val sigs = graft.ops.Dedup.signatureTable(docsND).persist()
      val bandHot = sigs.select(explode(
          graft.functions.BandKeys.band_keys(col("sig"), 64, 16)).as("bk"))
        .groupBy("bk").count()
      val bandStats = bandHot.agg(max("count").as("mx"),
        sum(when(col("count") > 1000, col("count")).otherwise(0L)).as("dropped1000"),
        sum(when(col("count") > 64, col("count")).otherwise(0L)).as("dropped64")).head()
      println(s"[probe] {" + s""""scale":"$label","guard":"minhash_band_buckets","max_bucket":${bandStats.getLong(0)},"rows_dropped_at_cap64":${bandStats.getLong(2)},"rows_dropped_at_cap1000":${bandStats.getLong(1)}""" + "}")
      sigs.unpersist(blocking = false)
      val shingleDf = docsND.select(explode(
          graft.functions.HashedShingles.hashed_shingles(col("text"), 3)).as("sh"), col("doc_id"))
        .groupBy("sh").agg(countDistinct("doc_id").as("df"))
      val cap = (2 * nDocs / 25).toInt
      val dfStats = shingleDf.agg(max("df").as("mx"),
        count(when(col("df") > cap, 1)).as("hot")).head()
      println(s"[probe] {" + s""""scale":"$label","guard":"containment_df_cap","max_df":${dfStats.getLong(0)},"cap":$cap,"shingles_dropped":${dfStats.getLong(1)}""" + "}")
      val gramHot = graft.ops.Multimodal.audioGrams(
          graft.ops.Multimodal.syntheticWavMedia(docs, textured = true))
        .groupBy("gram").count()
        .agg(max("count").as("mx"), count(when(col("count") > 256, 1)).as("hot")).head()
      println(s"[probe] {" + s""""scale":"$label","guard":"audio_gram_buckets","max_bucket":${gramHot.getLong(0)},"cap":256,"grams_dropped":${gramHot.getLong(1)}""" + "}")
      // fence distance: the incremental batch's distinct band keys vs the 4M flip
      val batchKeys = graft.ops.Dedup.signatureTable(perturbed.where(col("doc_id") % 10 === 0))
        .select(explode(graft.functions.BandKeys.band_keys(col("sig"), 64, 16)).as("bk"))
        .select("bk").distinct().count()
      println(s"[probe] {" + s""""scale":"$label","guard":"incremental_fence","batch_band_keys":$batchKeys,"flip_at":4000000""" + "}")
    }

    families(sf01, "sf0.1")
    families(outDir, "sf1")
    spark.stop()
  }
}
