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

  /** REAL image decoder behind the seam: `javax.imageio` (public JDK —
    * PNG/BMP/GIF/JPEG readers ship with the JRE, no native deps). Returns
    * None for bytes no installed reader accepts, which routes those rows
    * to the stub path — real media decodes, text-byte fixtures keep their
    * deterministic fake. */
  private def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (content == null || content.length < 8) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
    catch { case _: Throwable => None }

  /** STUB decoder for non-decodable payloads: derives a small
    * deterministic feature vector from the byte content so downstream
    * stages (similarity, clustering, filtering) are fully testable on
    * codec-less fixtures. Real media never reaches this — see
    * [[decodeImage]]. */
  private def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
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
    * size. Rows whose bytes decode as a real image get pixel-derived
    * features (per-band mean luminance); everything else falls back to
    * the deterministic stub. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "modality", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init (no tmp-file cache)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val feats = decodeImage(bytes) match {
          case Some(img) => bandFeatures(img, dim)
          case None      => decodeStub(bytes, dim)
        }
        Row(r.getLong(0), r.getString(1),
          (if (bytes == null) 0L else bytes.length.toLong),
          feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Features from REAL pixels: mean luminance of `dim` horizontal bands,
    * normalized to [0, 1]. */
  private def bandFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val out = new Array[Float](dim)
    var b = 0
    while (b < dim) {
      val y0 = (b.toLong * h / dim).toInt
      val y1 = math.max(((b + 1).toLong * h / dim).toInt, y0 + 1) min h
      var sum = 0L; var n = 0L; var y = y0
      while (y < y1) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1; n += 1 }
        y += 1
      }
      out(b) = if (n == 0) 0.0f else (sum.toDouble / (n * 255.0)).toFloat
      b += 1
    }
    out
  }

  /** Deterministic REAL-PNG fixture: a gray image per row whose pixel at
    * (x, y) is `(id*31 + 7x + 13y) mod 256`, PNG-encoded with the JDK
    * writer. PNG is lossless, so the decode side recovers these exact
    * pixels whatever the writer's compression choices — which is what
    * lets a SQL oracle verify a REAL codec round-trip: it recomputes the
    * pixel statistics from the formula, never touching the bytes. */
  def syntheticPngMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 0).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, ((id * 31 + 7L * x + 13L * y) % 256L).toInt); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray, Row(w, h, 0L, "image/png"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val imageStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_lum", LongType, nullable = false)))

  /** Decode images for real and report exact integer pixel statistics —
    * the end-to-end proof of the codec path (encode → parquet-able binary
    * column → partition-batched ImageIO decode → stats). Rows that don't
    * decode are dropped (they have no pixels to report). */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        decodeImage(r.getAs[Array[Byte]]("content")).map { img =>
          val w = img.getWidth; val h = img.getHeight
          val raster = img.getRaster
          var sum = 0L; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Row(r.getLong(0), w.toLong, h.toLong, w.toLong * h, sum)
        }
      }
    }
    spark.createDataFrame(rdd, imageStatsSchema)
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
