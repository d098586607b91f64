package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract stages.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel
  * extraction via `mapPartitions` on the binary column — is real and
  * tested, and so is the IMAGE path: PNG/JPEG/BMP/GIF decode via
  * `javax.imageio` (public JDK, no native deps) and resizing via our own
  * bilinear kernel, both oracle-verified end-to-end. Payloads no
  * installed reader accepts (and audio/video, which the JRE has no codec
  * for) fall back to `decodeStub`'s deterministic fake — the single
  * marked seam where a JNI/ffmpeg or Arrow-batch Python decoder plugs
  * in. At cluster scale the binary column rides Parquet's binary
  * encoding and never passes through the driver.
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
  /** Decode image bytes, or None when the bytes are PROVABLY not an
    * image. A decode failure must be proven deterministic before it
    * reads as garbage: the decodability floor silently DROPS media
    * whose decode returns None, so a TRANSIENT failure misclassified
    * as garbage becomes a permanently wrong curation decision —
    * reproduced in live-curator stress loops as a valid re-upload
    * vanishing with a clean store and an advanced cursor (the r15/r16
    * flake). The failure mode that actually reproduces is
    * `ImageIO.read` returning NULL — which it does exactly when NO
    * registered reader claims the stream — for bytes carrying a valid
    * PNG signature: the ImageIO plugin registry is per thread-group
    * application context, and an executor thread whose context
    * initialized badly sees an empty registry for the whole task (a
    * per-call retry cannot help — same thread, same registry; the old
    * swallow-everything catch then read it as "not an image").
    * Discrimination, mode by mode:
    *  - reader THREW (corrupt/truncated body behind a real signature):
    *    deterministic garbage — retried once, then dropped;
    *  - NULL and the bytes carry NO known-JDK image signature: genuine
    *    non-image payload — dropped (the stub-decoder fixtures);
    *  - NULL but the bytes DO carry a PNG/JPEG/GIF/BMP signature (the
    *    JDK always ships readers for these): registry breakage — repair
    *    with `scanForPlugins()` and retry; if the registry still claims
    *    nothing, THROW so the task fails and Spark retries it on a
    *    healthy context rather than silently misclassifying media.
    * Fatal VM errors always propagate (an OOM must fail the task).
    *
    * ROUND-17 RE-INVESTIGATION — decode EXONERATED, the true root cause
    * found upstream: the stress loop reproduced the
    * both-re-uploads-dropped signature at 1/20, 1/40, 1/60 with ZERO
    * decode forensic markers in the log (after this round's hardening,
    * decodeImage cannot return None for a known-signature payload
    * without printing one) and rehash-now reading 2/2 — the rows never
    * reached the decode at all. The actual mode: the seq-offset
    * planner's footer-read catch silently SKIPPED a committed log file
    * on a transient read failure, so one re-upload's row fell out of
    * the micro-batch while the batch's max seq still advanced the
    * cursor past it forever ([[graft.streaming.ParquetLogMicroBatchStream]]
    * `bounds` — fixed to retry-then-THROW; the r15/r16 flake has the
    * same observable, so the r16 decode root-cause was at most a
    * second contributor). THIS round's decode hardening stays, as
    * defense in depth: [[imageIoCacheOff]] disables ImageIO's DISK
    * cache JVM-wide (by default even a ByteArrayInputStream gets a
    * FileCacheImageInputStream whose tmpdir temp file is a transient-
    * failure surface and an I/O serialization point across 32
    * concurrent decode tasks); the thrown-retry path routes a NULL
    * retry result through the signature discrimination instead of
    * silently flattening it; and a double-throw on a known-JDK
    * signature prints its own greppable marker naming the exception,
    * so any future drop at this layer is attributable from the log
    * alone. */
  private def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (content == null || content.length < 8) return None
    imageIoCacheOff
    // Right(None) ⇔ no registered reader claimed the stream; Left ⇔ the
    // read threw; track the modes separately
    def attempt(): Either[Throwable, Option[java.awt.image.BufferedImage]] =
      try Right(Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))))
      catch { case scala.util.control.NonFatal(e) => Left(e) }
    // the NULL path: genuine non-image vs registry breakage
    def classifyNull(): Option[java.awt.image.BufferedImage] =
      if (!jdkImageSignature(content)) None // genuine non-image bytes
      else {
        // greppable forensic marker: this branch firing at all proves the
        // registry-breakage mode (a valid signature that no reader claims)
        System.err.println("[graft] image-decode: no ImageIO reader claimed a " +
          "known-signature payload; re-scanning plugins on this thread context")
        javax.imageio.ImageIO.scanForPlugins() // heal the thread-context registry
        attempt() match {
          case Right(Some(img)) => Some(img)
          case Left(_) => None // post-repair the reader ran and threw: corrupt body
          case Right(None) => throw new IllegalStateException(
            "transient image-decode failure: the bytes carry a PNG/JPEG/GIF/BMP " +
              "signature but no ImageIO reader claimed them even after " +
              "scanForPlugins() — plugin-registry breakage on this task's thread " +
              "context; failing the task so Spark retries it instead of " +
              "silently misclassifying valid media as garbage")
        }
      }
    attempt() match {
      case Right(Some(img)) => Some(img)
      case Right(None) => classifyNull()
      case Left(_) => attempt() match { // reader threw: one retry
        case Right(Some(img)) => Some(img)
        case Right(None) => classifyNull() // retry went NULL: discriminate, never flatten
        case Left(e2) =>
          if (jdkImageSignature(content))
            // greppable forensic marker for the residual double-throw mode
            System.err.println("[graft] image-decode: reader threw twice on a " +
              s"known-signature payload (${e2.getClass.getName}: ${e2.getMessage}); " +
              "dropping as corrupt body")
          None
      }
    }
  }

  /** Disable ImageIO's DISK cache once per JVM (idempotent, lazy —
    * first decode/encode on driver or executor trips it): every graft
    * payload is an in-memory byte array, so the default
    * FileCacheImage{Input,Output}Stream only adds a tmpdir temp file
    * per decode — a transient-failure surface (the r17 stress
    * recurrence) and an I/O serialization point 32 concurrent decode
    * tasks do not want. */
  private lazy val imageIoCacheOff: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Signatures of formats the JDK ALWAYS ships ImageIO readers for —
    * a no-reader result on these proves registry breakage, never an
    * unsupported format. (Deliberately excludes WEBP and friends: no
    * built-in reader, so a no-reader result there is expected.) */
  private def jdkImageSignature(c: Array[Byte]): Boolean =
    (c(0) == 0x89.toByte && c(1) == 'P' && c(2) == 'N' && c(3) == 'G') ||
      (c(0) == 0xFF.toByte && c(1) == 0xD8.toByte && c(2) == 0xFF.toByte) ||
      (c(0) == 'G' && c(1) == 'I' && c(2) == 'F' && c(3) == '8') ||
      (c(0) == 'B' && c(1) == 'M')

  /** Claim an ImageReader for multi-frame payloads with the same
    * transient-vs-deterministic discrimination as [[decodeImage]]:
    * None = genuinely not decodable media (no known-JDK signature);
    * registry breakage (a valid signature no reader claims even after
    * a plugin re-scan) THROWS so the task fails loudly and Spark
    * retries it — a silent `Iterator.empty` here would drop every
    * frame of valid media at the video dedup floor. */
  private def claimFrameReader(bytes: Array[Byte],
      in: javax.imageio.stream.ImageInputStream): Option[javax.imageio.ImageReader] = {
    imageIoCacheOff
    val rs = javax.imageio.ImageIO.getImageReaders(in)
    if (rs.hasNext) Some(rs.next())
    else if (bytes == null || bytes.length < 8 || !jdkImageSignature(bytes)) None
    else {
      System.err.println("[graft] frame-decode: no ImageIO reader claimed a " +
        "known-signature payload; re-scanning plugins on this thread context")
      javax.imageio.ImageIO.scanForPlugins()
      val rs2 = javax.imageio.ImageIO.getImageReaders(in)
      if (rs2.hasNext) Some(rs2.next())
      else throw new IllegalStateException(
        "transient frame-decode failure: the bytes carry a PNG/JPEG/GIF/BMP " +
          "signature but no ImageIO reader claimed them even after " +
          "scanForPlugins() — failing the task so Spark retries it instead of " +
          "silently dropping valid media's frames")
    }
  }

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
  def syntheticPngMedia(docs: DataFrame, idCol: String = "doc_id",
      fixedW: Int = 0, fixedH: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 0).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = if (fixedW > 0) fixedW else 16 + (id % 16).toInt
        val h = if (fixedH > 0) fixedH else 16 + (id % 8).toInt
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, ((id * 31 + 7L * x + 13L * y) % 256L).toInt); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff; javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray, Row(w, h, 0L, "image/png"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Deterministic REAL-JPEG fixture: a smooth gray gradient
    * `pixel(x, y) = (x*255/(w-1) + y*255/(h-1)) / 2` (integer division),
    * encoded with the JDK's JPEG writer. JPEG is lossy, so oracles check
    * the DIMENSIONS and pixel count (which survive the codec bit-exactly)
    * while pixel sums are spec-checked within a tolerance — the gradient
    * is smooth, exactly the content JPEG's DCT represents well. */
  def syntheticJpegMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 1).rdd.mapPartitions { it =>
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
          while (x < w) { raster.setSample(x, y, 0, (x * 255 / (w - 1) + y * 255 / (h - 1)) / 2); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff; javax.imageio.ImageIO.write(img, "jpg", bos)
        Row(id, "image", bos.toByteArray, Row(w, h, 0L, "image/jpeg"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Deterministic REAL-GIF fixture: a multi-frame (animated) GIF per
    * row — `3 + id % 3` full frames of `(16 + id%16) × (16 + id%8)` gray
    * pixels, frame `f`'s pixel at (x, y) being
    * `(id*31 + 7x + 13y + 29f) mod 256`, written frame-by-frame through
    * the JDK's GIF `ImageWriter` sequence API. A 256-level gray palette
    * fits GIF's 8-bit palette exactly, so the codec is LOSSLESS here and
    * a SQL oracle can re-derive every frame's pixel sum from the formula
    * — the video-container analog of [[syntheticPngMedia]]: real
    * multi-frame encode → binary column → per-frame decode. */
  def syntheticGifMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 2).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        val frames = 3 + (id % 3).toInt
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id * 31 + 7L * x + 13L * y + 29L * f) % 256L).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence(); ios.close(); writer.dispose()
        Row(id, "video", bos.toByteArray, Row(w, h, frames * 40L, "image/gif"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Mixed-codec duplicate fixture: consecutive id pairs (2j, 2j+1)
    * carry IDENTICAL pixels — formula keyed on j = id/2 — but 2j is
    * PNG-encoded and 2j+1 is BMP-encoded. Byte-level dedup (hash of
    * `content`) sees two distinct blobs; pixel-level dedup must pair
    * them. Both codecs are lossless for 8-bit gray, so the planted
    * pairs are exact at the pixel level. */
  def syntheticMixedCodecMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val j = id / 2
        val w = 16 + (j % 16).toInt
        val h = 16 + (j % 8).toInt
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, ((j * 31 + 7L * x + 13L * y) % 256L).toInt); x += 1 }
          y += 1
        }
        val fmt = if (id % 2 == 0) "png" else "bmp"
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff; javax.imageio.ImageIO.write(img, fmt, bos)
        Row(id, "image", bos.toByteArray, Row(w, h, 0L, s"image/$fmt"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Pixel-level exact image dedup: decode each payload, canonicalize to
    * the gray pixel byte stream, and group by its hash — finds the SAME
    * image stored under DIFFERENT encodings (PNG vs BMP vs re-encoded
    * copies), which byte-level [[Dedup.exact]] on `content` cannot pair
    * by construction. Decode is the partition-batched seam; everything
    * after it is a plain 16-bytes-per-row hash groupBy, the exact-dedup
    * scale shape. Output: `(keep_id, copies)` per duplicate group,
    * lowest id kept. Non-decodable payloads are dropped. */
  def pixelDedup(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        decodeImage(r.getAs[Array[Byte]]("content")).map { img =>
          val w = img.getWidth; val h = img.getHeight
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { px(y * w + x) = (img.getRGB(x, y) & 0xFF).toByte; x += 1 }
            y += 1
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
          Row(r.getLong(0), java.util.Base64.getEncoder.encodeToString(md.digest(px)))
        }
      }
    }
    val hashed = spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("px_hash", StringType, nullable = false))))
    hashed.groupBy("px_hash")
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("copies"))
      .select("keep_id", "copies")
  }

  private val frameStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  /** REAL per-frame decode of multi-frame containers (`ImageReader`
    * sequence API — GIF ships with the JRE): one output row per frame
    * with exact integer pixel statistics. Partition-batched like
    * [[imageStats]]; payloads with no reader are dropped. Gray values
    * come from `getRGB & 0xFF` (palette-indexed rasters store palette
    * INDICES in the sample — reading samples would silently report
    * indices, not pixels). */
  def frameStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        claimFrameReader(bytes, in) match {
          case None => in.close(); Iterator.empty
          case Some(reader) =>
          reader.setInput(in, false, true)
          val n = reader.getNumImages(true)
          val rows = (0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L; var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
              y += 1
            }
            Row(r.getLong(0), i.toLong, w.toLong, h.toLong, sum)
          }
          reader.dispose(); in.close()
          rows.iterator
        }
      }
    }
    spark.createDataFrame(rdd, frameStatsSchema)
  }

  /** Deterministic REAL-WAV fixture: 16-bit signed little-endian mono PCM
    * with `n = 800 + id % 400` samples of the integer waveform
    * `s(i) = (id*31 + 17*i) % 2003 - 1001`, wrapped through the JDK's
    * `javax.sound.sampled` WAVE writer. PCM is lossless, so the decode
    * side recovers the exact samples — the audio analog of
    * [[syntheticPngMedia]]: a SQL oracle re-derives the sample sum from
    * the formula without touching the bytes. */
  def syntheticWavMedia(docs: DataFrame, idCol: String = "doc_id",
      gain: Int = 1, padSamples: Int = 0, idOffset: Long = 0L,
      textured: Boolean = false): DataFrame = {
    // textured = the fingerprint-family fixture: samples come from the
    // multiply + double-xor-fold mixer (the texture-PNG trick) instead
    // of the sawtooth. The sawtooth waveforms are SHIFTED COPIES of one
    // arithmetic progression, so their energy envelopes correlate and
    // every pair looks near-dup to an envelope hash — exactly the
    // smooth-ramp degeneracy the image fixtures hit. Mixer samples give
    // ~independent envelopes: unrelated pairs sit at hamming ≈ 32,
    // planted copies at 0. The mixer is replayable in DuckDB
    // (xor + floor-division, positive operands throughout).
    // gain/padSamples/idOffset plant near-dup copies the way the texture
    // PNG fixture's shift/idOffset do: waveform and length stay keyed to
    // the ORIGINAL id, so (id, id + offset) are planted pairs — a
    // gain-scaled, silence-padded re-encode of the same recording. The
    // fingerprint is invariant to both by construction (energy
    // comparisons scale with gain; zero samples add nothing to any
    // window energy), so planted pairs land at hamming 0.
    require(gain >= 1 && gain <= 30, s"gain must keep 16-bit PCM exact, got $gain")
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 2).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val nOrig = 800 + (id % 400).toInt
        val n = nOrig + padSamples
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = if (i < nOrig) {
            val v =
              if (textured) {
                val m = (id * 31 + 17L * i) * 2654435761L
                (m ^ (m >> 15) ^ (m >> 30)) % 2003L - 1001L
              } else (id * 31 + 17L * i) % 2003L - 1001L
            (gain * v).toShort
          } else 0.toShort
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id + idOffset, "audio", bos.toByteArray, Row(0, 0, n * 1000L / 8000L, "audio/wav"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_amp", LongType, nullable = false)))

  /** Decode audio payloads for real (`javax.sound.sampled`, public JDK —
    * WAV/AIFF/AU readers ship with the JRE) and report exact integer
    * sample statistics — the audio end of the codec proof, shaped like
    * [[imageStats]]: partition-batched decode, rows that no installed
    * reader accepts are dropped. 16-bit PCM is parsed little/big-endian
    * per the stream's declared format. */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null || bytes.length < 12) None
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16, "fixture decoder handles 16-bit PCM")
            val data = ais.readAllBytes()
            val bigEndian = fmt.isBigEndian
            var sum = 0L; var i = 0
            while (i + 1 < data.length) {
              val lo = data(if (bigEndian) i + 1 else i) & 0xff
              val hi = data(if (bigEndian) i else i + 1)
              sum += (hi << 8 | lo).toShort
              i += 2
            }
            Some(Row(r.getLong(0), fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              (data.length / (2 * fmt.getChannels)).toLong, sum))
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
    spark.createDataFrame(rdd, audioStatsSchema)
  }

  private val audioActivitySchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("window_idx", LongType, nullable = false),
    StructField("n_in_window", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("active", BooleanType, nullable = false)))

  /** Voice-activity segmentation over decoded PCM — the ASR-pipeline
    * pre-filter that drops silence before any expensive transcription
    * model runs: the sample stream is cut into fixed windows of
    * `windowSamples`, each window reports its exact integer
    * sum-of-|amplitude|, and `active` = mean |amplitude| above
    * `threshold`, compared cross-multiplied in integers so there is no
    * float anywhere for an oracle to disagree with. Same
    * partition-batched decode shape as [[audioStats]]; interleaved
    * channels are windowed as one stream (the fixture corpus is mono).
    * At scale this is a narrow flatMap — windows per row, no shuffle. */
  def audioActivity(
      media: DataFrame,
      windowSamples: Int = 160,
      threshold: Int = 600): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null || bytes.length < 12) Iterator.empty
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16, "fixture decoder handles 16-bit PCM")
            val data = ais.readAllBytes()
            val bigEndian = fmt.isBigEndian
            val n = data.length / 2
            val nWindows = (n + windowSamples - 1) / windowSamples
            (0 until nWindows).iterator.map { w =>
              val from = w * windowSamples
              val until = math.min(from + windowSamples, n)
              var sum = 0L; var i = from
              while (i < until) {
                val lo = data(if (bigEndian) 2 * i + 1 else 2 * i) & 0xff
                val hi = data(if (bigEndian) 2 * i else 2 * i + 1)
                sum += math.abs((hi << 8 | lo).toShort.toLong)
                i += 1
              }
              val inWindow = (until - from).toLong
              Row(r.getLong(0), w.toLong, inWindow, sum, sum > threshold * inWindow)
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }
    spark.createDataFrame(rdd, audioActivitySchema)
  }

  private val audioFpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_windows", LongType, nullable = false),
    StructField("afp", LongType, nullable = false)))

  /** Audio fingerprint over the REAL PCM decode: a difference hash on
    * the energy envelope — the windowed-spectral-landmark idea
    * (Shazam/Chromaprint family) reduced to its integer core, covering
    * the WHOLE recording at any duration the way the image dHash covers
    * the whole image at any resolution. Trailing silence (zero samples)
    * is trimmed first; the trimmed stream is cut into
    * `max(minWindowSamples, ceil(effLen / (nBits + 1)))`-sample windows
    * — duration-PROPORTIONAL, so the `nBits + 1` windows always tile the
    * full signal and bit `nBits - 1` observes the recording's END, not
    * its first fraction of a second. Window w's energy is its exact
    * integer sum-of-|amplitude|; fingerprint bit k is set iff
    * energy(k+1) > energy(k). Short recordings (fewer than `nBits + 1`
    * minimum-size windows) fall back to fixed `minWindowSamples` windows
    * and leave high bits 0; `n_windows` carries the trimmed window count
    * for [[audioNearDup]]'s length gate.
    *
    * Two invariances hold by construction — exactly the re-encodings an
    * ASR-ingest dedup must catch:
    *  - GAIN: scaling every sample by g > 0 scales every window energy
    *    by g, preserving every comparison AND every zero sample —
    *    identical fingerprint and window count;
    *  - TRAILING SILENCE: trimmed before the window size is chosen, so
    *    a padded re-encode reproduces the original's windows, bits, and
    *    `n_windows` exactly.
    * Like [[perceptualHash]], this is a narrow partition-batched
    * decode — no shuffle, rows that do not decode are dropped; the
    * 8-byte fingerprint is the stored artifact, the audio bytes stay
    * cold. Every energy is an exact integer, so a SQL oracle replays
    * every bit from the waveform formula ([[syntheticWavMedia]]). */
  def audioFingerprint(
      media: DataFrame,
      minWindowSamples: Int = 16,
      nBits: Int = 64): DataFrame = {
    require(nBits >= 1 && nBits <= 64, s"fingerprint must fit 64 bits, got $nBits")
    require(minWindowSamples >= 1, s"window must hold a sample, got $minWindowSamples")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null || bytes.length < 12) None
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16, "fixture decoder handles 16-bit PCM")
            val data = ais.readAllBytes()
            val bigEndian = fmt.isBigEndian
            val n = data.length / 2
            val amp = new Array[Int](n)
            var eff = 0
            var i = 0
            while (i < n) {
              val lo = data(if (bigEndian) 2 * i + 1 else 2 * i) & 0xff
              val hi = data(if (bigEndian) 2 * i else 2 * i + 1)
              val s = (hi << 8 | lo).toShort.toInt
              amp(i) = math.abs(s)
              if (s != 0) eff = i + 1
              i += 1
            }
            // duration-proportional window: nBits + 1 windows tile the
            // trimmed signal; short streams keep the minimum granularity
            val ws = math.max(minWindowSamples, (eff + nBits) / (nBits + 1))
            val nWindows = (eff + ws - 1) / ws
            val energy = new Array[Long](math.max(nWindows, 1))
            i = 0
            while (i < eff) { energy(i / ws) += amp(i).toLong; i += 1 }
            var afp = 0L
            var k = 0
            val kMax = math.min(nBits, nWindows - 1)
            while (k < kMax) {
              if (energy(k + 1) > energy(k)) afp |= 1L << k
              k += 1
            }
            Some(Row(r.getLong(0), nWindows.toLong, afp))
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
    spark.createDataFrame(rdd, audioFpSchema)
  }

  /** Textured multi-frame GIF fixture for the video near-dup family —
    * the [[syntheticTexturePngMedia]] mixer with a frame term (the ramp
    * GIF fixture is degenerate for gradient hashes the same way the
    * ramp PNGs were). `shift` brightens every pixel mod 256 — the
    * dHash-invariant perturbation except at wraps; `idOffset` relabels
    * ids while keeping dims, frame count, and texture keyed to the
    * ORIGINAL id, so (id, id + offset) are planted near-dup videos. */
  def syntheticTextureGifMedia(docs: DataFrame, idCol: String = "doc_id",
      shift: Int = 0, idOffset: Long = 0L): DataFrame = {
    require(shift >= 0, s"shift must be >= 0 (oracle replays with truncated %), got $shift")
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 2).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        val frames = 3 + (id % 3).toInt
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val a = id * 31 + 7L * x + 13L * y + 29L * f
              val m = a * 2654435761L
              val v = (m ^ (m >> 15) ^ (m >> 30)) + shift
              raster.setSample(x, y, 0, java.lang.Math.floorMod(v, 256L).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence(); ios.close(); writer.dispose()
        Row(id + idOffset, "video", bos.toByteArray, Row(w, h, frames * 40L, "image/gif"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val frameHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Per-frame dHash over the REAL multi-frame decode — the video
    * fingerprint: one 64-bit [[perceptualHash]]-rule signature per
    * frame, so a video is a SEQUENCE of frame hashes and temporal
    * structure survives (what a single whole-video hash loses). Frames
    * are read with `getRGB & 0xFF` — exact for the gray-palette GIF
    * frames ([[frameStats]]'s proven read; indexed rasters return
    * palette positions, not values). Narrow partition-batched decode. */
  def videoFrameHashes(media: DataFrame, hashW: Int = 8, hashH: Int = 8): DataFrame = {
    require(hashW * hashH <= 64, s"hash must fit 64 bits, got ${hashW}x$hashH")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        claimFrameReader(bytes, in) match {
          case None => in.close(); Iterator.empty
          case Some(reader) =>
          reader.setInput(in, false, true)
          val n = reader.getNumImages(true)
          val rows = (0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth; val h = img.getHeight
            var hash = 0L
            var y = 0
            while (y < hashH) {
              val sy = y * h / hashH
              var x = 0
              while (x < hashW) {
                val pa = img.getRGB(x * w / (hashW + 1), sy) & 0xFF
                val pb = img.getRGB((x + 1) * w / (hashW + 1), sy) & 0xFF
                if (pb > pa) hash |= 1L << (y * hashW + x)
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), i.toLong, hash)
          }
          reader.dispose(); in.close()
          rows.iterator
        }
      }
    }
    spark.createDataFrame(rdd, frameHashSchema)
  }

  /** Video near-dup pairs from a `(media_id, frame_idx, phash)` table:
    * two videos are near-dups when they have the SAME frame count and
    * EVERY temporally-aligned frame pair is within `maxHamming` — the
    * per-frame pigeonhole-segment machinery of [[perceptualNearDup]]
    * with the frame index as part of the bucket key, so candidates only
    * pair frame f with frame f (a re-encode/brightness-shift of the
    * same cut; offset-tolerant matching is the audio gram shape, not
    * this one). Any aligned pair within the distance shares ≥ 1 whole
    * segment (pigeonhole), so the count of verified frames reaching
    * the full frame count IS the every-frame guarantee. Hot (frame,
    * segment, value) buckets above `maxBucket` drop whole — the
    * standard degenerate-content trade. Emits `(id_a, id_b, n_frames,
    * max_frame_hamming)`; only frame HASHES shuffle, never frames. */
  /** Persist-fence shared by the ONE-SHOT near-dup/containment
    * operators: their plans reference the decode input from several
    * subtrees (per-media totals, hot-bucket counts, BOTH self-join
    * branches), and Spark rebuilds each subtree — so the
    * partition-batched media DECODE re-executed once per reference (up
    * to 8 `Scan ExistingRDD` nodes in the sweep plan; at 100 TB that
    * is decoding the corpus eight times). Persisting the shared frames
    * runs the decode ONCE; the eager `localCheckpoint` materializes
    * the (pair-sized) result so every cache drops immediately — the
    * same discipline the incremental stages already use. */
  private def withPersistFence(
      stage: scala.collection.mutable.Buffer[DataFrame] => DataFrame): DataFrame = {
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = stage(persisted)
    val ck = out.localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    ck
  }

  def videoNearDup(
      frameHashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    withPersistFence(videoNearDupStage(frameHashes, maxHamming, maxBucket, _))

  private[graft] def videoNearDupStage(
      frameHashes0: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val nSeg = maxHamming + 1
    require(64 % nSeg == 0, s"maxHamming + 1 = $nSeg must divide 64 to tile the hash")
    val segBits = 64 / nSeg
    val frameHashes = frameHashes0.persist()
    persisted += frameHashes
    val counts = frameHashes.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    val segmented = frameHashes.select(
      col("media_id").as("id"), col("frame_idx").as("f"), col("phash"),
      posexplode(array((0 until nSeg).map(s =>
        shiftright(col("phash"), s * segBits).bitwiseAND(lit((1L << segBits) - 1))): _*)))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    val hot = segmented.groupBy("f", "seg", "segval").count()
      .where(col("count") > maxBucket).select("f", "seg", "segval")
    val kept = segmented.join(hot, Seq("f", "seg", "segval"), "left_anti").persist()
    persisted += kept
    val verified = kept
      .select(col("f"), col("seg"), col("segval"), col("id").as("id_a"), col("phash").as("ph_a"))
      .join(kept.select(col("f"), col("seg"), col("segval"),
        col("id").as("id_b"), col("phash").as("ph_b")), Seq("f", "seg", "segval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("f"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hd"))
      .where(col("hd") <= maxHamming)
      .distinct()
    verified.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_frames"), max("hd").as("max_frame_hamming"))
      .join(counts.select(col("media_id").as("id_a"), col("nf").as("__nfa")), Seq("id_a"))
      .join(counts.select(col("media_id").as("id_b"), col("nf").as("__nfb")), Seq("id_b"))
      .where(col("n_frames") === col("__nfa") && col("__nfa") === col("__nfb"))
      .select(col("id_a"), col("id_b"), col("n_frames"),
        col("max_frame_hamming").cast("bigint").as("max_frame_hamming"))
  }

  /** Textured GIF CLIP fixture: frames `[frameStart, frameStart +
    * nFrames)` of the ORIGINAL video ([[syntheticTextureGifMedia]]'s
    * mixer at frame term `f + frameStart`), optionally
    * brightness-shifted — a planted re-cut of every original, the video
    * analog of [[syntheticWavClip]]. */
  def syntheticTextureGifClip(docs: DataFrame, idCol: String = "doc_id",
      frameStart: Int = 1, nFrames: Int = 2, shift: Int = 0,
      idOffset: Long = 150000L): DataFrame = {
    require(shift >= 0, s"shift must be >= 0 (oracle replays with truncated %), got $shift")
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 2).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val a = id * 31 + 7L * x + 13L * y + 29L * (f + frameStart)
              val m = a * 2654435761L
              val v = (m ^ (m >> 15) ^ (m >> 30)) + shift
              raster.setSample(x, y, 0, java.lang.Math.floorMod(v, 256L).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence(); ios.close(); writer.dispose()
        Row(id + idOffset, "video", bos.toByteArray, Row(w, h, nFrames * 40L, "image/gif"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Clip-in-video containment: which stored videos contain a query
    * clip's FRAME RUN at some temporal offset — the video analog of
    * [[audioClipContainment]], for re-cut reuploads. Unlike
    * [[videoNearDup]] the frame index is NOT in the bucket key
    * (clip frame f must meet corpus frame f + offset): candidates come
    * from the plain pigeonhole segment join, each candidate frame pair
    * verifies at `bit_count ≤ maxHamming`, and a full run (verified
    * count at ONE offset == the clip's frame count) emits `(clip_id,
    * corpus_id, offset_frames, n_frames)`. Pigeonhole still guarantees
    * recall per frame pair; hot (segment, value) buckets above
    * `maxBucket` drop whole. Only 8-byte frame hashes shuffle. */
  def videoClipContainment(
      clipHashes: DataFrame,
      corpusHashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    withPersistFence(videoClipContainmentStage(clipHashes, corpusHashes,
      maxHamming, maxBucket, _))

  private[graft] def videoClipContainmentStage(
      clipHashes0: DataFrame,
      corpusHashes0: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val nSeg = maxHamming + 1
    require(64 % nSeg == 0, s"maxHamming + 1 = $nSeg must divide 64 to tile the hash")
    val segBits = 64 / nSeg
    def segmented(df: DataFrame, idAs: String, fAs: String, phAs: String) = df.select(
      col("media_id").as(idAs), col("frame_idx").as(fAs), col("phash").as(phAs),
      posexplode(array((0 until nSeg).map(s =>
        shiftright(col("phash"), s * segBits).bitwiseAND(lit((1L << segBits) - 1))): _*)))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    val clipHashes = clipHashes0.persist()
    persisted += clipHashes
    val corpusHashes = corpusHashes0.persist()
    persisted += corpusHashes
    val totals = clipHashes.groupBy(col("media_id")).agg(count(lit(1)).as("__total"))
    val corpusSeg = segmented(corpusHashes, "corpus_id", "cf", "ph_b")
    val hot = corpusSeg.groupBy("seg", "segval").count()
      .where(col("count") > maxBucket).select("seg", "segval")
    val kept = corpusSeg.join(hot, Seq("seg", "segval"), "left_anti")
    val verified = segmented(clipHashes, "clip_id", "kf", "ph_a")
      .join(kept, Seq("seg", "segval"))
      .select(col("clip_id"), col("corpus_id"), col("kf"), col("cf"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hd"))
      .where(col("hd") <= maxHamming)
      .distinct()
    verified
      .groupBy(col("clip_id"), col("corpus_id"), (col("cf") - col("kf")).as("offset_frames"))
      .agg(count(lit(1)).as("n_frames"))
      .join(broadcast(totals.select(col("media_id").as("clip_id"), col("__total"))), Seq("clip_id"))
      .where(col("n_frames") === col("__total") && col("offset_frames") >= 0)
      .select(col("clip_id"), col("corpus_id"), col("offset_frames"), col("n_frames"))
  }

  /** Corpus-SELF video containment sweep: every shorter video that is
    * a frame-run re-cut of any LONGER stored one — the video analog of
    * [[audioContainmentSweep]], the one-shot corpus-vs-corpus form of
    * [[videoClipContainment]] (which needs a designated clip batch).
    * Same LENGTH-ORDERED pairing, on FRAME COUNTS: each pair examined
    * once with the fewer-frames side as the contained candidate; the
    * unaligned pigeonhole segment self-join proposes frame-pair
    * candidates, each verifies at `bit_count ≤ maxHamming`, and a full
    * run (verified count at ONE offset == the shorter side's frame
    * count) emits `(id_short, id_long, offset_frames, n_frames)`.
    *
    * 100 TB shape: only 8-byte frame hashes shuffle (one symmetric
    * segment equi-join, hot buckets dropped before it); the
    * (short, long, offset) count partial-aggregates map-side, and the
    * per-video frame totals join AFTER the aggregate keyed on id —
    * candidates only, no forced broadcast of a corpus-wide table. */
  def videoContainmentSweep(
      frameHashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    withPersistFence(videoContainmentSweepStage(frameHashes, maxHamming, maxBucket, _))

  private[graft] def videoContainmentSweepStage(
      frameHashes0: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val nSeg = maxHamming + 1
    require(64 % nSeg == 0, s"maxHamming + 1 = $nSeg must divide 64 to tile the hash")
    val segBits = 64 / nSeg
    val frameHashes = frameHashes0.persist()
    persisted += frameHashes
    val totals = frameHashes.groupBy(col("media_id")).agg(count(lit(1)).as("__t"))
    val segs = frameHashes.select(
      col("media_id").as("id"), col("frame_idx").as("f"), col("phash"),
      posexplode(array((0 until nSeg).map(s =>
        shiftright(col("phash"), s * segBits).bitwiseAND(lit((1L << segBits) - 1))): _*)))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    val hot = segs.groupBy("seg", "segval").count()
      .where(col("count") > maxBucket).select("seg", "segval")
    val kept = segs.join(hot, Seq("seg", "segval"), "left_anti").persist()
    persisted += kept
    val verified = kept.select(col("seg"), col("segval"),
        col("id").as("id_short"), col("f").as("kf"), col("phash").as("ph_s"))
      .join(kept.select(col("seg"), col("segval"),
        col("id").as("id_long"), col("f").as("cf"), col("phash").as("ph_l")),
        Seq("seg", "segval"))
      .where(col("id_short") =!= col("id_long"))
      .select(col("id_short"), col("id_long"), col("kf"), col("cf"),
        bit_count(col("ph_s").bitwiseXOR(col("ph_l"))).as("hd"))
      .where(col("hd") <= maxHamming)
      .distinct()
    verified
      .groupBy(col("id_short"), col("id_long"), (col("cf") - col("kf")).as("offset_frames"))
      .agg(count(lit(1)).as("n_frames"))
      .join(totals.select(col("media_id").as("id_short"), col("__t").as("__ts")), Seq("id_short"))
      .join(totals.select(col("media_id").as("id_long"), col("__t").as("__tl")), Seq("id_long"))
      .where(col("n_frames") === col("__ts") && col("offset_frames") >= 0 &&
        (col("__ts") < col("__tl") ||
          (col("__ts") === col("__tl") && col("id_short") < col("id_long"))))
      .select(col("id_short"), col("id_long"), col("offset_frames"), col("n_frames"))
  }

  /** Incremental video near-dup: same-cut videos between a NEW batch's
    * frame hashes and the STORED corpus table (`id_a` = batch, `id_b` =
    * stored) — the recurring form of [[videoNearDup]], the
    * [[perceptualNearDupIncremental]] broadcast shape with the frame
    * index riding the bucket key and the every-aligned-frame gate on
    * top: the batch's (frame, segment, value) keys broadcast
    * (count-fenced), the stored corpus semi-joins against them and
    * never shuffles, per-side hot caps bound degenerate buckets, and a
    * pair emits only when its verified frame count equals BOTH sides'
    * frame counts. */
  def videoNearDupIncremental(
      newHashes: DataFrame,
      storedHashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256,
      maxBroadcastKeys: Long = 4L * 1000 * 1000): DataFrame = {
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = videoNearDupIncrementalStage(newHashes, storedHashes,
      maxHamming, maxBucket, maxBroadcastKeys, persisted)
    val ck = out.localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    ck
  }

  private[graft] def videoNearDupIncrementalStage(
      newHashes: DataFrame,
      storedHashes: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      maxBroadcastKeys: Long,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    // the pair stage IS the shared gated stage with the frame index
    // riding the bucket key (candidates only pair frame f with frame
    // f); the every-aligned-frame count gate layers on top
    val newCounts = newHashes.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    val storedCounts = storedHashes.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    def framed(df: DataFrame) = df.select(
      col("media_id"), col("frame_idx").as("f"), col("phash"))
    val verified = hammingNearDupIncrementalStage(
        framed(newHashes), framed(storedHashes),
        "phash", Seq("f"), maxHamming, maxBucket, maxBroadcastKeys, persisted)
      .withColumnRenamed("hamming", "hd")
    verified.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_frames"), max("hd").as("max_frame_hamming"))
      .join(broadcast(newCounts.select(col("media_id").as("id_a"), col("nf").as("__nfa"))), Seq("id_a"))
      .join(storedCounts.select(col("media_id").as("id_b"), col("nf").as("__nfb")), Seq("id_b"))
      .where(col("n_frames") === col("__nfa") && col("__nfa") === col("__nfb"))
      .select(col("id_a"), col("id_b"), col("n_frames"),
        col("max_frame_hamming").cast("bigint").as("max_frame_hamming"))
  }

  private val audioGramSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  /** Positional energy-sign grams over the REAL PCM decode — the audio
    * analog of the text substring family's hashed shingles: the
    * recording's window-energy SIGN string (bit w = energy(w+1) >
    * energy(w), [[audioFingerprint]]'s bit rule without the 64-bit cap)
    * is cut into every `gramWindows`-long substring with its window
    * position. Signs are gain-invariant, and a clip cut at a
    * WINDOW-ALIGNED sample offset reproduces the parent's sign string
    * exactly over the shared windows — so clip-in-recording containment
    * becomes a gram equi-join, like substring spans over text.
    *
    * `hopSamples` is the alignment-granularity knob (the overlapping
    * hop production fingerprinting pays): at the default
    * hop = windowSamples, windows tile without overlap and only cuts at
    * whole-window sample offsets are detectable; at hop < window
    * (hop = windowSamples/2 is the standard point) windows OVERLAP, the
    * gram table grows by windowSamples/hop ×, and a cut at ANY multiple
    * of `hopSamples` lands back on the corpus hop grid — halving the
    * hop halves the alignment blind spot at linear gram-count cost (see
    * SCALING.md). Overlapped windows are emitted only when FULL
    * (truncated tail windows would mix the clip's end into an energy
    * the parent computes over later samples, breaking the equi-join
    * contract); the legacy hop == window path keeps its partial tail
    * window, preserving the stored-gram-table format.
    *
    * The gram is the literal sign substring (`gramWindows` chars of
    * 0/1); at 64+ windows a pipeline would hash it to 8 bytes — the
    * join key either way. Narrow partition-batched decode, no shuffle.
    * `pos` is in HOP units. */
  def audioGrams(
      media: DataFrame,
      windowSamples: Int = 16,
      gramWindows: Int = 24,
      hopSamples: Int = -1): DataFrame = {
    require(gramWindows >= 8, s"gram needs enough windows to be selective, got $gramWindows")
    val hop = if (hopSamples <= 0) windowSamples else hopSamples
    require(hop <= windowSamples, s"hop must not exceed the window, got $hop > $windowSamples")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        if (bytes == null || bytes.length < 12) Iterator.empty
        else try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16, "fixture decoder handles 16-bit PCM")
            val data = ais.readAllBytes()
            val bigEndian = fmt.isBigEndian
            val n = data.length / 2
            val nWindows =
              if (hop == windowSamples) (n + windowSamples - 1) / windowSamples
              else if (n >= windowSamples) (n - windowSamples) / hop + 1
              else 0
            val energy = new Array[Long](nWindows)
            var w = 0
            while (w < nWindows) {
              val from = w * hop
              val until = math.min(from + windowSamples, n)
              var sum = 0L; var i = from
              while (i < until) {
                val lo = data(if (bigEndian) 2 * i + 1 else 2 * i) & 0xff
                val hi = data(if (bigEndian) 2 * i else 2 * i + 1)
                sum += math.abs((hi << 8 | lo).toShort.toLong)
                i += 1
              }
              energy(w) = sum
              w += 1
            }
            val signs = new StringBuilder(math.max(0, nWindows - 1))
            var k = 0
            while (k < nWindows - 1) {
              signs.append(if (energy(k + 1) > energy(k)) '1' else '0')
              k += 1
            }
            val s = signs.toString
            val id = r.getLong(0)
            (0 to s.length - gramWindows).iterator.map(p =>
              Row(id, p.toLong, s.substring(p, p + gramWindows)))
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      }
    }
    spark.createDataFrame(rdd, audioGramSchema)
  }

  /** Clip-in-recording containment: which stored recordings contain a
    * query CLIP (at window granularity) — the audio rung of the
    * substring-dedup ladder, the "this snippet is already in the
    * corpus" check an ASR-ingest dedup runs on clip reuploads. Every
    * clip gram must align at ONE offset: candidates come from a gram
    * equi-join, grouped by (clip, corpus, offset = corpus pos − clip
    * pos), and a full match (count == the clip's gram count) emits
    * `(clip_id, corpus_id, offset_windows, n_grams)`.
    *
    * 100 TB shape mirrors the text incremental: the CLIP batch's gram
    * table broadcasts (count-fenced with a shuffle fallback); the
    * stored corpus grams are scanned once, never shuffled — only
    * MATCHED rows reach the (clip, corpus, offset) aggregate, and the
    * partial count collapses map-side. Corpus grams hotter than
    * `maxBucket` are dropped whole before the join (degenerate audio —
    * silence, tones — would otherwise expand O(corpus)); a clip
    * overlapping a dropped gram cannot reach a full match, the strict
    * trade documented on the text side's df cap too. */
  def audioClipContainment(
      clips: DataFrame,
      corpus: DataFrame,
      windowSamples: Int = 16,
      gramWindows: Int = 24,
      maxBucket: Int = 256,
      maxBroadcastKeys: Long = 4L * 1000 * 1000,
      hopSamples: Int = -1): DataFrame = {
    val clipGrams = audioGrams(clips, windowSamples, gramWindows, hopSamples)
      .select(col("media_id").as("clip_id"), col("pos").as("kpos"), col("gram"))
    val corpusGrams = audioGrams(corpus, windowSamples, gramWindows, hopSamples)
      .select(col("media_id").as("corpus_id"), col("pos").as("cpos"), col("gram"))
    audioClipContainmentFromGrams(clipGrams, corpusGrams, maxBucket, maxBroadcastKeys)
  }

  /** The join half of [[audioClipContainment]], over precomputed gram
    * tables — the stored-artifact form (grams computed once at ingest,
    * kept hot while the waveforms stay cold). */
  def audioClipContainmentFromGrams(
      clipGrams: DataFrame,
      corpusGrams: DataFrame,
      maxBucket: Int = 256,
      maxBroadcastKeys: Long = 4L * 1000 * 1000): DataFrame = {
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = audioClipContainmentStage(clipGrams, corpusGrams,
      maxBucket, maxBroadcastKeys, persisted)
    val ck = out.localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    ck
  }

  /** The pre-checkpoint containment stage — split out so PlanSpec can
    * assert the broadcast shape (`localCheckpoint` truncates the
    * visible plan, the [[perceptualNearDupIncrementalStage]] pattern). */
  private[graft] def audioClipContainmentStage(
      clipGrams: DataFrame,
      corpusGrams0: DataFrame,
      maxBucket: Int,
      maxBroadcastKeys: Long,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    // the corpus grams feed the hot count AND the kept filter — persist
    // so the (decode-backed, in the one-shot form) scan runs once
    val corpusGrams = corpusGrams0.persist()
    persisted += corpusGrams
    val hot = corpusGrams.groupBy("gram").count()
      .where(col("count") > maxBucket).select("gram")
    val kept = corpusGrams.join(hot, Seq("gram"), "left_anti")
    val totals = clipGrams.groupBy("clip_id").agg(count(lit(1)).as("__total"))
    val cg = clipGrams.persist()
    persisted += cg
    val bcast = cg.limit((maxBroadcastKeys + 1).toInt).count() <= maxBroadcastKeys
    val joined =
      if (bcast) kept.join(broadcast(cg), Seq("gram"))
      else kept.join(cg, Seq("gram"))
    joined
      .groupBy(col("clip_id"), col("corpus_id"), (col("cpos") - col("kpos")).as("offset_windows"))
      .agg(count(lit(1)).as("n_grams"))
      .join(broadcast(totals), Seq("clip_id"))
      .where(col("n_grams") === col("__total") && col("offset_windows") >= 0)
      .select(col("clip_id"), col("corpus_id"), col("offset_windows"), col("n_grams"))
  }

  /** Corpus-SELF containment sweep: every shorter recording that is a
    * window-aligned re-cut of any LONGER stored recording — the
    * one-shot corpus-vs-corpus form of [[audioClipContainment]] (which
    * needs a designated clip batch), the shape of a reupload sweep over
    * an already-ingested corpus. Same gram machinery; the pairing rule
    * is LENGTH-ORDERED: a pair is examined once, with the side holding
    * fewer grams (the duration proxy) as the contained candidate —
    * `(n_grams, media_id)` lexicographic, so equal-length pairs (full
    * re-encodes) surface exactly once too. Emits
    * `(id_short, id_long, offset_windows, n_grams)`.
    *
    * 100 TB shape: ONLY gram rows shuffle — one symmetric equi-join on
    * the gram key (the one-shot trade; the recurring form stays
    * [[audioClipContainment]]'s clip-batch broadcast), with hot grams
    * above `maxBucket` dropped whole BEFORE the join. The
    * (short, long, offset) count partial-aggregates map-side, and the
    * per-recording gram totals join AFTER the aggregate, keyed on id —
    * candidates only, never the gram table (totals are corpus-wide
    * here, so no broadcast is forced; AQE picks one when they fit). */
  def audioContainmentSweep(
      corpus: DataFrame,
      windowSamples: Int = 16,
      gramWindows: Int = 24,
      maxBucket: Int = 256): DataFrame =
    audioContainmentSweepFromGrams(
      audioGrams(corpus, windowSamples, gramWindows), maxBucket)

  /** The join half of [[audioContainmentSweep]], over a precomputed
    * `(media_id, pos, gram)` table ([[audioGrams]] or the durable
    * [[graft.views.AudioGramTableView]]). */
  def audioContainmentSweepFromGrams(
      grams: DataFrame,
      maxBucket: Int = 256): DataFrame =
    withPersistFence(audioContainmentSweepStage(grams, maxBucket, _))

  private[graft] def audioContainmentSweepStage(
      grams0: DataFrame,
      maxBucket: Int,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val grams = grams0.persist()
    persisted += grams
    val totals = grams.groupBy(col("media_id")).agg(count(lit(1)).as("__t"))
    val hot = grams.groupBy("gram").count()
      .where(col("count") > maxBucket).select("gram")
    val kept = grams.join(hot, Seq("gram"), "left_anti").persist()
    persisted += kept
    kept.select(col("media_id").as("id_short"), col("pos").as("apos"), col("gram"))
      .join(kept.select(col("media_id").as("id_long"), col("pos").as("bpos"), col("gram")),
        Seq("gram"))
      .where(col("id_short") =!= col("id_long"))
      .groupBy(col("id_short"), col("id_long"),
        (col("bpos") - col("apos")).as("offset_windows"))
      .agg(count(lit(1)).as("n_grams"))
      .join(totals.select(col("media_id").as("id_short"), col("__t").as("__ts")), Seq("id_short"))
      .join(totals.select(col("media_id").as("id_long"), col("__t").as("__tl")), Seq("id_long"))
      .where(col("n_grams") === col("__ts") && col("offset_windows") >= 0 &&
        (col("__ts") < col("__tl") ||
          (col("__ts") === col("__tl") && col("id_short") < col("id_long"))))
      .select(col("id_short"), col("id_long"), col("offset_windows"), col("n_grams"))
  }

  /** Window-aligned clip fixture for the containment family: the
    * samples of the TEXTURED waveform ([[syntheticWavMedia]]) from
    * sample `startWindow * 16` for `nWindows * 16` samples, gain-scaled
    * — a planted sub-segment of every original, replayable in SQL from
    * the same mixer formula at the shifted sample index. */
  def syntheticWavClip(
      docs: DataFrame,
      idCol: String = "doc_id",
      startWindow: Int = 8,
      nWindows: Int = 32,
      gain: Int = 1,
      idOffset: Long = 90000L,
      startSamples: Int = -1): DataFrame = {
    require(gain >= 1 && gain <= 30, s"gain must keep 16-bit PCM exact, got $gain")
    val spark = docs.sparkSession
    // startSamples >= 0 cuts at an ARBITRARY sample offset (the
    // non-window-aligned re-cut fixture for the overlapping-hop grams);
    // the default stays the window-aligned startWindow * 16
    val s0 = if (startSamples >= 0) startSamples else startWindow * 16
    val len = nWindows * 16
    val rdd = docs.select(col(idCol)).where(col(idCol) % 3 === 2).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val pcm = new Array[Byte](len * 2)
        var i = 0
        while (i < len) {
          val m = (id * 31 + 17L * (i + s0)) * 2654435761L
          val v = (m ^ (m >> 15) ^ (m >> 30)) % 2003L - 1001L
          val s = (gain * v).toShort
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, len.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id + idOffset, "audio", bos.toByteArray, Row(0, 0, len * 1000L / 8000L, "audio/wav"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Audio near-dup pairs from a `(media_id, n_windows, afp)`
    * fingerprint table: the [[perceptualNearDup]] pigeonhole-segment
    * machinery with the trimmed WINDOW COUNT riding the bucket key —
    * [[videoNearDup]]'s frame-count gate in audio form. Candidates only
    * pair recordings whose duration-proportional window counts match,
    * so two recordings sharing an intro but differing in length cannot
    * pair on the intro alone (and since [[audioFingerprint]] tiles the
    * whole signal, equal-count recordings differing in their TAILS
    * diverge in the high bits and fail the hamming verify). Pigeonhole
    * recall is unchanged — a true pair has equal counts and shares ≥ 1
    * whole segment; hot `(n_windows, segment, value)` buckets above
    * `maxBucket` drop whole. Emits `(id_a, id_b, n_windows, hamming)`;
    * only 8-byte fingerprints shuffle. */
  def audioNearDup(
      fingerprints: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    withPersistFence(audioNearDupStage(fingerprints, maxHamming, maxBucket, _))

  private[graft] def audioNearDupStage(
      fingerprints0: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val nSeg = maxHamming + 1
    require(64 % nSeg == 0, s"maxHamming + 1 = $nSeg must divide 64 to tile the hash")
    val segBits = 64 / nSeg
    val fingerprints = fingerprints0.persist()
    persisted += fingerprints
    val segmented = fingerprints.select(
      col("media_id").as("id"), col("n_windows").as("nw"), col("afp"),
      posexplode(array((0 until nSeg).map(s =>
        shiftright(col("afp"), s * segBits).bitwiseAND(lit((1L << segBits) - 1))): _*)))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    val hot = segmented.groupBy("nw", "seg", "segval").count()
      .where(col("count") > maxBucket).select("nw", "seg", "segval")
    val kept = segmented.join(hot, Seq("nw", "seg", "segval"), "left_anti").persist()
    persisted += kept
    kept.select(col("nw"), col("seg"), col("segval"),
        col("id").as("id_a"), col("afp").as("fp_a"))
      .join(kept.select(col("nw"), col("seg"), col("segval"),
        col("id").as("id_b"), col("afp").as("fp_b")), Seq("nw", "seg", "segval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("nw").as("n_windows"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental audio near-dup: a NEW batch's fingerprints against the
    * STORED corpus table (`id_a` = batch, `id_b` = stored) —
    * [[perceptualNearDupIncremental]]'s broadcast shape with
    * [[audioNearDup]]'s window-count gate riding the bucket key: the
    * batch's count-fenced `(n_windows, segment, value)` keys broadcast,
    * the stored corpus semi-joins against them and never shuffles, hot
    * caps apply per side. Emits `(id_a, id_b, n_windows, hamming)`. */
  def audioNearDupIncremental(
      newFingerprints: DataFrame,
      storedFingerprints: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256,
      maxBroadcastKeys: Long = 4L * 1000 * 1000): DataFrame = {
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = audioNearDupIncrementalStage(newFingerprints, storedFingerprints,
      maxHamming, maxBucket, maxBroadcastKeys, persisted)
    val ck = out.localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    ck
  }

  /** The pre-checkpoint pair stage — [[hammingNearDupIncrementalStage]]
    * with the window-count gate column riding the bucket key; split out
    * so PlanSpec can assert the broadcast shape (`localCheckpoint`
    * truncates the visible plan). Caches land in `persisted`. */
  private[graft] def audioNearDupIncrementalStage(
      newFingerprints: DataFrame,
      storedFingerprints: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      maxBroadcastKeys: Long,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame =
    hammingNearDupIncrementalStage(newFingerprints, storedFingerprints,
      "afp", Seq("n_windows"), maxHamming, maxBucket, maxBroadcastKeys, persisted)

  /** The shared incremental hamming-near-dup pair stage: a NEW batch's
    * 64-bit hashes against a STORED corpus, pigeonhole segments tiling
    * the hash, with optional GATE columns riding the bucket key (the
    * audio window count; image has none) so candidates only pair rows
    * agreeing on every gate. 100 TB shape, identical for every caller:
    * the batch's count-fenced `(gates…, segment, value)` key set
    * broadcasts (falling back to a symmetric shuffle past
    * `maxBroadcastKeys` — a corpus-sized "batch" IS the one-shot), the
    * stored corpus semi-joins against it and never shuffles, hot caps
    * apply per side. Emits `(id_a, id_b, gates…, hamming)`. */
  private[graft] def hammingNearDupIncrementalStage(
      newHashes: DataFrame,
      storedHashes: DataFrame,
      hashCol: String,
      gateCols: Seq[String],
      maxHamming: Int,
      maxBucket: Int,
      maxBroadcastKeys: Long,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val nSeg = maxHamming + 1
    require(64 % nSeg == 0, s"maxHamming + 1 = $nSeg must divide 64 to tile the hash")
    val segBits = 64 / nSeg
    val keyCols = gateCols ++ Seq("seg", "segval")
    def segmented(df: DataFrame, idAs: String, hAs: String) = df.select(
      col("media_id").as(idAs) +: gateCols.map(col) ++: Seq(
        col(hashCol).as(hAs),
        posexplode(array((0 until nSeg).map(s =>
          shiftright(col(hashCol), s * segBits).bitwiseAND(lit((1L << segBits) - 1))): _*))): _*)
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    val bn0 = segmented(newHashes, "id_a", "h_a")
    val hotNew = bn0.groupBy(keyCols.map(col): _*).count()
      .where(col("count") > maxBucket).select(keyCols.map(col): _*)
    val bn = bn0.join(hotNew, keyCols, "left_anti")
    val newKeys = bn.select(keyCols.map(col): _*).distinct().persist()
    persisted += newKeys
    // fence: a batch whose key set won't broadcast is corpus-sized —
    // fall back to the symmetric shuffle (the one-shot's shape)
    val bcast = newKeys.count() <= maxBroadcastKeys
    val stored = segmented(storedHashes, "id_b", "h_b")
    val matched =
      (if (bcast) stored.join(broadcast(newKeys), keyCols)
       else stored.join(newKeys, keyCols)).persist()
    persisted += matched
    val hotBase = matched.groupBy(keyCols.map(col): _*).count()
      .where(col("count") > maxBucket).select(keyCols.map(col): _*)
    bn.join(matched.join(hotBase, keyCols, "left_anti"), keyCols)
      .select(Seq(col("id_a"), col("id_b")) ++ gateCols.map(col) :+
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"): _*)
      .where(col("hamming") <= maxHamming)
      .distinct()
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

  /** Nearest-neighbor 1-D byte resample — the fallback for payloads that
    * are not decodable images (deterministic, so the ASCII fixtures stay
    * byte-for-byte oracle-checkable in DuckDB). */
  private def resampleStub(b: Array[Byte], outLen: Int): Array[Byte] =
    if (b == null || b.isEmpty || outLen <= 0) Array.empty[Byte]
    else {
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { out(i) = b((i.toLong * b.length / outLen).toInt); i += 1 }
      out
    }

  /** REAL resize kernel: center-aligned bilinear resample of the image's
    * band 0 (grayscale; a color build loops bands identically). The
    * arithmetic is deliberately our own rather than `Graphics2D` so it is
    * EXACTLY reproducible: at an integer 2× downscale the sample point
    * lands mid-cell and the kernel degenerates to the 4-neighbor average
    * `(p00+p10+p01+p11+2) / 4` in pure integer math — which is what lets
    * a SQL oracle replay the resize bit-for-bit (see `q_image_resize`).
    * Weights are dyadic rationals there, so the double-precision path has
    * zero rounding error. */
  private def bilinearResize(img: java.awt.image.BufferedImage, tw: Int, th: Int): java.awt.image.BufferedImage = {
    val sw = img.getWidth; val sh = img.getHeight
    val src = img.getRaster
    val out = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val dst = out.getRaster
    val sx = sw.toDouble / tw; val sy = sh.toDouble / th
    var y = 0
    while (y < th) {
      val fy = math.max(0.0, math.min((y + 0.5) * sy - 0.5, sh - 1.0))
      val y0 = fy.toInt; val y1 = math.min(sh - 1, y0 + 1); val wy = fy - y0
      var x = 0
      while (x < tw) {
        val fx = math.max(0.0, math.min((x + 0.5) * sx - 0.5, sw - 1.0))
        val x0 = fx.toInt; val x1 = math.min(sw - 1, x0 + 1); val wx = fx - x0
        val p00 = src.getSample(x0, y0, 0); val p10 = src.getSample(x1, y0, 0)
        val p01 = src.getSample(x0, y1, 0); val p11 = src.getSample(x1, y1, 0)
        val v = (1 - wy) * ((1 - wx) * p00 + wx * p10) + wy * ((1 - wx) * p01 + wx * p11)
        dst.setSample(x, y, 0, math.min(255, (v + 0.5).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize media payloads to `targetW` × `targetH`: payloads that decode
    * as real images go through [[bilinearResize]] and are re-encoded as
    * lossless PNG (format rewritten accordingly); everything else keeps
    * the deterministic byte-stub resample with format preserved. Runs
    * partition-batched like the other codec stages (decoder init once per
    * partition, no shuffle, metadata rewritten to the target dims). */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "modality", "content", "meta").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val (outBytes, fmtOverride) = decodeImage(bytes) match {
          case Some(img) =>
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(bilinearResize(img, targetW, targetH), "png", bos)
            (bos.toByteArray, Some("image/png"))
          case None => (resampleStub(bytes, targetW * targetH), None)
        }
        val meta = r.getAs[Row]("meta")
        val duration = if (meta == null || meta.isNullAt(2)) 0L else meta.getLong(2)
        val format = fmtOverride.getOrElse(
          if (meta == null || meta.isNullAt(3)) null else meta.getString(3))
        Row(r.getLong(0), r.getString(1), outBytes, Row(targetW, targetH, duration, format))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

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

  /** Textured PNG fixture for the perceptual-hash family: pixel values
    * come from a multiply + double-xor-fold integer mixer, so distinct
    * images hash ~independently (the smooth-ramp fixtures are
    * brightness-shifted copies of each other under any gradient hash —
    * every same-size pair collides). `shift` brightens every pixel by a
    * constant mod 256: the dHash-invariant perturbation except where
    * values wrap, which is exactly the "slightly edited copy" a
    * perceptual near-dup pass must catch. `idOffset` relabels ids while
    * keeping dims and texture keyed to the ORIGINAL id, so (id,
    * id + offset) are planted near-dup pairs. */
  def syntheticTexturePngMedia(docs: DataFrame, idCol: String = "doc_id",
      shift: Int = 0, idOffset: Long = 0L): DataFrame = {
    // the DuckDB oracles replay the pixel formula with truncated `%`,
    // which agrees with floorMod only while `v` stays non-negative:
    // shift must not be negative, and ids must keep a*2654435761 below
    // 2^63 (true for every fixture id; r7 ADVICE) — fail loudly rather
    // than silently diverge from the oracle
    require(shift >= 0, s"shift must be >= 0 (oracle replays with truncated %), got $shift")
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
          while (x < w) {
            val a = id * 31 + 7L * x + 13L * y
            val m = a * 2654435761L
            val v = (m ^ (m >> 15) ^ (m >> 30)) + shift
            raster.setSample(x, y, 0, java.lang.Math.floorMod(v, 256L).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        imageIoCacheOff; javax.imageio.ImageIO.write(img, "png", bos)
        Row(id + idOffset, "image", bos.toByteArray, Row(w, h, 0L, "image/png"))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val phashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** dHash perceptual fingerprint (difference hash — the public aHash/
    * dHash family used by large-scale image dedup pipelines): decode,
    * nearest-neighbor downsample the gray channel to (hashW+1)×hashH,
    * and set one bit per cell for "right neighbor brighter" — a 64-bit
    * signature invariant to resizing and global brightness shifts
    * (modulo wrap), cheap enough to compute at ingest and store as a
    * bucket key. Narrow partition-batched decode, no shuffle; rows that
    * do not decode are dropped. */
  def perceptualHash(media: DataFrame, hashW: Int = 8, hashH: Int = 8): DataFrame = {
    require(hashW * hashH <= 64, s"hash must fit 64 bits, got ${hashW}x$hashH")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        decodeImage(r.getAs[Array[Byte]]("content")).map { img =>
          val w = img.getWidth; val h = img.getHeight
          // raw band-0 samples, NOT getRGB: the gray->sRGB color map is
          // monotone but not injective, so it collapses near-tie
          // neighbors and flips comparison bits (imageStats' choice,
          // for the same exactness reason)
          val raster = img.getRaster
          var hash = 0L
          var y = 0
          while (y < hashH) {
            val sy = y * h / hashH
            var x = 0
            while (x < hashW) {
              val pa = raster.getSample(x * w / (hashW + 1), sy, 0)
              val pb = raster.getSample((x + 1) * w / (hashW + 1), sy, 0)
              if (pb > pa) hash |= 1L << (y * hashW + x)
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), hash)
        }
      }
    }
    spark.createDataFrame(rdd, phashSchema)
  }

  /** Perceptual near-dup pairs from a stored `(media_id, phash)` table:
    * pigeonhole segment join (the [[graft.ops.Dedup.simhashDedup]]
    * scheme — `maxHamming + 1` segments tiling the 64 bits, so any pair
    * within the distance shares ≥ 1 whole segment and the candidate
    * join shuffles 8-byte keys), verified by `bit_count(xor)`. EXACT
    * except for segment buckets over `maxBucket` (dropped whole — the
    * standard hot-bucket trade; mixer-textured corpora never approach
    * it, flat-image corpora would). */
  def perceptualNearDup(
      hashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256): DataFrame =
    withPersistFence(perceptualNearDupStage(hashes, maxHamming, maxBucket, _))

  private[graft] def perceptualNearDupStage(
      hashes0: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    val nSeg = maxHamming + 1
    require(64 % nSeg == 0, s"maxHamming + 1 = $nSeg must divide 64 to tile the hash")
    val segBits = 64 / nSeg
    val hashes = hashes0.persist()
    persisted += hashes
    val segmented = hashes.select(
      col("media_id").as("id"), col("phash"),
      posexplode(array((0 until nSeg).map(s =>
        shiftright(col("phash"), s * segBits).bitwiseAND(lit((1L << segBits) - 1))): _*)))
      .withColumnRenamed("pos", "seg").withColumnRenamed("col", "segval")
    val hot = segmented.groupBy("seg", "segval").count()
      .where(col("count") > maxBucket).select("seg", "segval")
    val kept = segmented.join(hot, Seq("seg", "segval"), "left_anti").persist()
    persisted += kept
    kept.select(col("seg"), col("segval"), col("id").as("id_a"), col("phash").as("ph_a"))
      .join(kept.select(col("seg"), col("segval"), col("id").as("id_b"), col("phash").as("ph_b")),
        Seq("seg", "segval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental perceptual near-dup: hamming-≤`maxHamming` pairs
    * between a NEW image batch's phashes and the STORED corpus table
    * (`id_a` = batch, `id_b` = stored) — the recurring form of
    * [[perceptualNearDup]], completing the multimodal ladder the text
    * side already has (`minhashLshIncrementalStored`). Within-batch
    * pairs are the batch's own one-shot pass, not this one's.
    *
    * Same 100 TB shape as the text incremental: the BATCH's pigeonhole
    * segment keys broadcast (count-fenced), the stored corpus
    * semi-joins against them and never shuffles — recurring cost ∝
    * batch × matched bucket population, never the corpus. Hot-bucket
    * caps apply per side (batch buckets before keying, matched stored
    * buckets before expansion), so a degenerate segment value cannot
    * expand O(corpus); a true pair is missed only if EVERY segment it
    * shares is hot on some side. */
  def perceptualNearDupIncremental(
      newHashes: DataFrame,
      storedHashes: DataFrame,
      maxHamming: Int = 7,
      maxBucket: Int = 256,
      maxBroadcastKeys: Long = 4L * 1000 * 1000): DataFrame = {
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = perceptualNearDupIncrementalStage(newHashes, storedHashes,
      maxHamming, maxBucket, maxBroadcastKeys, persisted)
    val ck = out.localCheckpoint(true)
    persisted.foreach(_.unpersist(blocking = false))
    ck
  }

  /** The pre-checkpoint pair stage — [[hammingNearDupIncrementalStage]]
    * with no gate columns; split out so PlanSpec can assert the
    * broadcast shape (`localCheckpoint` truncates the visible plan). */
  private[graft] def perceptualNearDupIncrementalStage(
      newHashes: DataFrame,
      storedHashes: DataFrame,
      maxHamming: Int,
      maxBucket: Int,
      maxBroadcastKeys: Long,
      persisted: scala.collection.mutable.Buffer[DataFrame]): DataFrame =
    hammingNearDupIncrementalStage(newHashes, storedHashes,
      "phash", Nil, maxHamming, maxBucket, maxBroadcastKeys, persisted)
}
