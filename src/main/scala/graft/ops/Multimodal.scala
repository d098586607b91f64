package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract stages.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel
  * extraction via `mapPartitions` on the binary column — is real and
  * tested. The media decode itself is STUBBED with a deterministic fake
  * (this container has no image/audio codecs); `decodeStub` is the single
  * marked seam where a real decoder (JNI ffmpeg/libjpeg, or a Python
  * worker via Arrow batches) plugs in. At cluster scale the binary column
  * rides Parquet's binary encoding and never passes through the driver.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType))), nullable = true)))

  /** Build a media frame from any table by packing a string column into
    * the binary payload — a deterministic fixture generator so the whole
    * pipeline is exercisable without real media files. */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        (col(idCol) % 1024 + 32).cast("int").as("width"),
        (col(idCol) % 768 + 32).cast("int").as("height"),
        (col(idCol) * 40 % 60000).as("duration_ms"),
        lit("synthetic/v1").as("format")).as("meta"))

  /** STUB decoder: a real implementation would decode the codec bytes to
    * pixels/samples here. The fake derives a small deterministic feature
    * vector from the byte content so downstream stages (similarity,
    * clustering, filtering) are fully testable. */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real decoder goes here (e.g. libjpeg via JNI, Arrow IPC to a
    //        Python worker). Deterministic fake below.
    val out = new Array[Float](dim)
    if (content != null) {
      var i = 0
      var h = 1125899906842597L
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      var j = 0
      while (j < dim) {
        val v = (h ^ (h >>> 17)) * (j * 2654435761L + 1)
        out(j) = ((v % 1000L).toFloat) / 1000.0f
        j += 1
      }
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Feature extraction over binary media, one partition at a time —
    * the batch shape a real decoder needs (amortized codec init per
    * partition, vectorized inner loop). `dim` is the output embedding
    * size. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "modality", "content").rdd.mapPartitions { it =>
      // per-partition decoder init would happen here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        Row(r.getLong(0), r.getString(1),
          (if (bytes == null) 0L else bytes.length.toLong),
          decodeStub(bytes, dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** STUB resize: nearest-neighbor 1-D byte resampling standing in for a
    * pixel resize (a real implementation decodes, resamples 2-D, and
    * re-encodes — the codec seam is [[decodeStub]]'s). The Spark-side
    * shape is the real part: a narrow one-pass kernel per row, metadata
    * rewritten to the target dims, no shuffle. Deterministic, so the
    * DuckDB oracle reproduces the resampled digest byte-for-byte on the
    * ASCII fixture. */
  private val resampleBytes = udf { (b: Array[Byte], outLen: Int) =>
    if (b == null || b.isEmpty || outLen <= 0) Array.empty[Byte]
    else {
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { out(i) = b((i.toLong * b.length / outLen).toInt); i += 1 }
      out
    }
  }

  /** Resize media payloads to `targetW` × `targetH` "pixels" (bytes in
    * the stub): content resampled, `meta.width/height` rewritten, format
    * preserved. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.select(
      col("media_id"), col("modality"),
      resampleBytes(col("content"), lit(targetW * targetH)).as("content"),
      struct(
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.format").as("format")).as("meta"))

  /** Frame sampling for video-like payloads: emit every `stride`-th chunk
    * of the binary as a "frame" row — the explode-shaped plan (1 row → N
    * frame rows) a real video pipeline has, with deterministic fake
    * chunking. Frames carry an md5 digest (byte-for-byte checkable by an
    * external oracle) alongside the raw bytes. */
  def sampleFrames(media: DataFrame, chunkBytes: Int = 256, stride: Int = 4): DataFrame =
    media.where(col("modality") === "video")
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0L), greatest(
            (length(col("content")).cast("long") / lit(chunkBytes * stride)).cast("long") - 1, lit(0L))),
          i => substring(col("content"), (i * chunkBytes * stride + 1).cast("int"), lit(chunkBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_md5", md5(col("frame_bytes")))
}
