package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE north star): image/audio/video
  * as opaque `binary` columns + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch transforms.
  *
  * Decode is REAL for the modalities the JDK can express — PNG via
  * `javax.imageio` (q52), WAV via `javax.sound.sampled` (q63), and
  * clip demux + per-frame PNG decode for the intra-coded video shape
  * (q71) — each dispatched by magic bytes and gated against a
  * pixel/sample-formula oracle. Payloads no wired codec recognizes
  * fall back to the labeled `stubDecodeFeatures` byte histogram, so
  * the pipeline keeps its shape for codecs this container lacks
  * (inter-coded video, lossy audio). The mapPartitions boundary is
  * exactly where a JNI/FFI decoder with per-partition init (model
  * load, codec context) belongs — the same shape `mapInPandas` gives
  * PySpark, minus the Python round-trip.
  */
object Multimodal {

  /** Media-table schema: opaque payload + typed metadata (the pattern
    * for any binary modality).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),       // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  val FeatureDim = 16

  private val PngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      java.util.Arrays.equals(bytes.take(4), PngMagic)

  /** REAL image decode (`javax.imageio` — in every JRE, no extra
    * dependency): PNG bytes → (width, height, L1-normalized
    * `FeatureDim`-bucket histogram of the blue channel — exact
    * luminance for grayscale, where r=g=b). Returns None for
    * undecodable payloads so callers can fall back to the stub.
    * PNG is lossless: the pixel values round-trip exactly, which is
    * what lets a SQL oracle recompute the histogram from the pixel
    * formula (q52).
    */
  def decodePngFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Double](FeatureDim)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            hist((img.getRGB(x, y) & 0xFF) * FeatureDim / 256) += 1d
            y += 1
          }
          x += 1
        }
        val n = (w * h).toDouble
        var j = 0
        while (j < FeatureDim) { hist(j) /= n; j += 1 }
        Some((w, h, hist))
      }
    } catch { case _: Exception => None }

  /** Deterministic tiny grayscale PNG: pixel(x, y) = (seed*31 +
    * x*h + y) mod 256 on all three channels. The encode side of the
    * q52 round trip — ingest's stand-in for real image payloads.
    */
  def syntheticPng(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        // floorMod keeps the channel in [0, 255] for ANY seed (plain %
        // goes negative on negative seeds / Long overflow, exactly the
        // hazard the WAV generator below guards against)
        val v = Math.floorMod(seed * 31 + x * h + y, 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        y += 1
      }
      x += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val JpegMagic = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 &&
      java.util.Arrays.equals(bytes.take(3), JpegMagic)

  /** Deterministic FLAT grayscale JPEG: every pixel =
    * (seed*31) mod 256, encoded TYPE_BYTE_GRAY at compression quality
    * 1.0. Flat + max quality is the one JPEG class with an EXACT
    * oracle: a constant block has only a DC coefficient, the
    * quality-1.0 quantization tables are all ones, and the
    * single-component gray path has no chroma subsampling or color
    * conversion — so the lossy codec round-trips this payload
    * bit-exactly (pinned for all 256 values in MultimodalSpec;
    * textured payloads are BOUNDED-error and stay spec-gated).
    */
  def syntheticJpeg(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val v = Math.floorMod(seed * 31, 256L).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { raster.setSample(x, y, 0, v); y += 1 }
      x += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL JPEG decode (`javax.imageio`): bytes → (width, height,
    * min/max/sum over the decoded LUMINANCE samples, read from the
    * raster band 0 — `getRGB` would re-run a color conversion the
    * gray path never took). Returns None for undecodable payloads.
    */
  def decodeJpegGrayStats(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var (mn, mx, sum) = (Long.MaxValue, Long.MinValue, 0L)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            val s = raster.getSample(x, y, 0).toLong
            sum += s
            if (s < mn) mn = s
            if (s > mx) mx = s
            y += 1
          }
          x += 1
        }
        if (w == 0 || h == 0) None else Some((w, h, mn, mx, sum))
      }
    } catch { case _: Exception => None }

  /** JPEG → L1-normalized `FeatureDim`-bucket histogram over the
    * decoded RASTER samples (band 0). The PNG path's `getRGB & 0xFF`
    * is identity for images written as RGB, but a grayscale JPEG
    * loads as TYPE_BYTE_GRAY and `getRGB` would re-map gray→sRGB —
    * the raster read sees the decoder's actual luminance values.
    */
  def decodeJpegFeatures(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val hist = new Array[Double](FeatureDim)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            hist(raster.getSample(x, y, 0) * FeatureDim / 256) += 1d
            y += 1
          }
          x += 1
        }
        val n = (w * h).toDouble
        if (n == 0) None
        else {
          var j = 0
          while (j < FeatureDim) { hist(j) /= n; j += 1 }
          Some(hist)
        }
      }
    } catch { case _: Exception => None }

  /** q124's operator: encode a deterministic flat JPEG per row and run
    * it through the REAL JDK JPEG decoder — the lossy-image analog of
    * q52, one codec context per partition, no shuffle. The flat-field
    * construction makes the decoded stats exactly recomputable.
    */
  def jpegRoundTripStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("px_min", LongType),
      StructField("px_max", LongType),
      StructField("px_sum", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val (w, h, mn, mx, sum) = decodeJpegGrayStats(syntheticJpeg(id))
          .getOrElse(throw new IllegalStateException(
            s"JPEG round-trip failed for id $id"))
        Row(id, w, h, mn, mx, sum)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Deterministic 8×8 RAMP GIF: 256-level grayscale IDENTITY palette
    * (entry i = rgb(i,i,i)), pixel (x,y) = (seed·31 + y·w + x) mod
    * 256. GIF's LZW compression is lossless over palette indices, so
    * unlike the JPEG flat field this TEXTURED payload round-trips
    * exactly — the gate covers a non-constant raster through a real
    * lossy-container-free codec.
    */
  def syntheticGif(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          Math.floorMod(seed * 31 + y * w + x, 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a'

  /** REAL GIF decode (`javax.imageio`): bytes → (width, height,
    * min/max/sum over the decoded GRAY levels). The decoded image is
    * palette-indexed, so values read through `getRGB & 0xFF` — the
    * palette lookup — not the raw raster index (identical here only
    * because the identity palette makes index == gray; the RGB read
    * is the decode-correct path for ANY palette).
    */
  def decodeGifGrayStats(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (mn, mx, sum) = (Long.MaxValue, Long.MinValue, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val s = (img.getRGB(x, y) & 0xFF).toLong
            sum += s
            if (s < mn) mn = s
            if (s > mx) mx = s
            x += 1
          }
          y += 1
        }
        if (w == 0 || h == 0) None else Some((w, h, mn, mx, sum))
      }
    } catch { case _: Exception => None }

  /** q141's operator: encode a deterministic ramp GIF per row and run
    * it through the REAL JDK GIF decoder — the palette-codec analog
    * of [[jpegRoundTripStats]], one codec context per partition, no
    * shuffle.
    */
  def gifRoundTripStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("px_min", LongType),
      StructField("px_max", LongType),
      StructField("px_sum", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = syntheticGif(id)
        require(isGif(bytes), s"GIF encoder produced a non-GIF for id $id")
        val (w, h, mn, mx, sum) = decodeGifGrayStats(bytes)
          .getOrElse(throw new IllegalStateException(
            s"GIF round-trip failed for id $id"))
        Row(id, w, h, mn, mx, sum)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  private val RiffMagic = Array('R'.toByte, 'I'.toByte, 'F'.toByte, 'F'.toByte)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      java.util.Arrays.equals(bytes.take(4), RiffMagic) &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Shared WAV-open preamble: JDK header parse, 16-bit mono
    * PCM_SIGNED check, endian-correct sample view. One definition so
    * the stats and feature decoders can never drift apart.
    */
  private def readPcm16(bytes: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, java.nio.ShortBuffer)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        Some((fmt,
          java.nio.ByteBuffer.wrap(in.readAllBytes()).order(order)
            .asShortBuffer()))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode (`javax.sound.sampled` — in every JRE, no extra
    * dependency): WAV bytes → (sample rate, per-sample stats over the
    * decoded 16-bit PCM stream). The JDK's WAV reader parses the RIFF
    * header and hands back raw frames; PCM is lossless, so a SQL
    * oracle can recompute every stat from the sample formula (q63).
    * Returns None for undecodable payloads so callers can fall back to
    * the stub. Integer stats only — no float hazard in the gate.
    */
  def decodeWavStats(bytes: Array[Byte]): Option[WavStats] =
    readPcm16(bytes).flatMap { case (fmt, sb) =>
      var (n, mn, mx, sum, sumSq) = (0L, Long.MaxValue, Long.MinValue, 0L, 0L)
      while (sb.hasRemaining) {
        val s = sb.get().toLong
        n += 1; sum += s; sumSq += s * s
        if (s < mn) mn = s
        if (s > mx) mx = s
      }
      if (n == 0) None
      else Some(WavStats(fmt.getSampleRate.toLong, n, mn, mx, sum, sumSq))
    }

  final case class WavStats(sampleRate: Long, nSamples: Long,
      sMin: Long, sMax: Long, sSum: Long, sSumSq: Long)

  /** WAV → L1-normalized `FeatureDim`-bucket histogram of the decoded
    * 16-bit sample values — the audio analog of the PNG histogram, for
    * the generic [[decodeFeatures]] dispatch.
    */
  def decodeWavFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    readPcm16(bytes).flatMap { case (_, sb) =>
      val hist = new Array[Float](FeatureDim)
      var n = 0
      while (sb.hasRemaining) {
        hist((sb.get().toInt + 32768) * FeatureDim / 65536) += 1f
        n += 1
      }
      if (n == 0) None
      else {
        var j = 0
        while (j < FeatureDim) { hist(j) /= n; j += 1 }
        Some(hist)
      }
    }

  /** Deterministic tiny mono 16-bit PCM WAV: sample(i) =
    * ((seed*31 + i*7) mod 65536) - 32768. The encode side of the q63
    * round trip — ingest's stand-in for real audio payloads. Built
    * byte-by-byte (RIFF/fmt/data chunks) so the DECODER under test is
    * the JDK's, not our own writer's inverse.
    */
  def syntheticWav(seed: Long, n: Int = 64, sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1)                      // PCM
    bb.putShort(1)                      // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)           // byte rate
    bb.putShort(2)                      // block align
    bb.putShort(16)                     // bits per sample
    bb.put("data".getBytes); bb.putInt(n * 2)
    var i = 0
    while (i < n) {
      // floorMod keeps the sample in [-32768, 32767] for ANY seed
      // (negative or wrapping); plain % would leave Short range and
      // silently wrap away from the documented formula
      bb.putShort((Math.floorMod(seed * 31 + i * 7, 65536L) - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** q63's operator: encode a deterministic WAV per row and run it
    * through the REAL JDK decoder — one codec pass per partition, no
    * shuffle. Integer outputs are exactly recomputable from the sample
    * formula, so a SQL oracle gates the decoder's actual output.
    */
  def wavRoundTripStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("sample_rate", LongType),
      StructField("n_samples", LongType),
      StructField("s_min", LongType),
      StructField("s_max", LongType),
      StructField("s_sum", LongType),
      StructField("s_sum_sq", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val s = decodeWavStats(syntheticWav(id))
          .getOrElse(throw new IllegalStateException(
            s"WAV round-trip failed for id $id"))
        Row(id, s.sampleRate, s.nSamples, s.sMin, s.sMax, s.sSum, s.sSumSq)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** STUB decode: byte-value histogram over `FeatureDim` buckets,
    * L1-normalized. Deterministic, shape-stable, and cheap — the
    * fallback for modalities whose codecs aren't wired (audio/video).
    */
  def stubDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) * FeatureDim / 256) += 1f
        i += 1
      }
      var j = 0
      while (j < FeatureDim) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Frame sampling STUB: every `stride`-th 256-byte block stands in
    * for a decoded frame; real video sampling keeps the same
    * (media_id, frame_idx, frame_bytes) contract.
    */
  def stubSampleFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] =
    if (bytes == null) Seq.empty
    else bytes.grouped(256).zipWithIndex.collect {
      case (chunk, idx) if idx % stride == 0 => (idx, chunk)
    }.toSeq

  private val ClipMagic =
    Array('G'.toByte, 'M'.toByte, 'J'.toByte, 'V'.toByte)

  def isClip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      java.util.Arrays.equals(bytes.take(4), ClipMagic)

  /** Minimal motion-JPEG-style clip container: magic + length-prefixed
    * intra-coded frames (each a REAL PNG). Real codecs (MJPEG, ProRes,
    * intra-only AV1) have exactly this access pattern — independent
    * frames behind a framing layer — and the JDK ships no inter-coded
    * video decoder, so this is the honest real-decode boundary:
    * container parsing and per-frame pixel decode are real, only the
    * container format is ours.
    */
  def syntheticClip(seed: Long, nFrames: Int = 3): Array[Byte] = {
    val frames = (0 until nFrames).map(f => syntheticPng(seed + f))
    val bb = java.nio.ByteBuffer.allocate(4 + frames.map(4 + _.length).sum)
    bb.put(ClipMagic)
    frames.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  /** Parse the clip container into its frame payloads (REAL framing:
    * bad lengths → truncate, exactly how a demuxer treats a torn
    * tail).
    */
  def clipFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    if (!isClip(bytes)) Seq.empty
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4)
      val out = Seq.newBuilder[Array[Byte]]
      var ok = true
      while (ok && bb.remaining() >= 4) {
        val len = bb.getInt
        if (len < 0 || len > bb.remaining()) ok = false
        else {
          val frame = new Array[Byte](len)
          bb.get(frame)
          out += frame
        }
      }
      out.result()
    }

  /** Decode a media frame-batch per partition: one decoder context per
    * partition (init cost amortized over the batch, exactly where a
    * real codec's native context lives), preserving partitioning — no
    * shuffle.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select(col("media_id"), col("kind"), col("bytes"))
      .rdd.mapPartitions { it =>
        // per-partition "decoder init": disable ImageIO's disk-backed
        // stream cache — the default creates a temp FILE per decode,
        // which a 100M-row pass would pay per row
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          // dispatch on the payload's magic bytes, not the declared
          // kind: PNG and WAV get the REAL decoders; everything else
          // (video) takes the stub WITHOUT paying codec sniffing per row
          val features =
            if (isPng(bytes)) decodePngFeatures(bytes) match {
              case Some((_, _, hist)) => hist.map(_.toFloat).toSeq
              case None => stubDecodeFeatures(bytes).toSeq // corrupt PNG
            }
            else if (isJpeg(bytes)) decodeJpegFeatures(bytes)
              .map(_.map(_.toFloat).toSeq)
              .getOrElse(stubDecodeFeatures(bytes).toSeq)
            else if (isWav(bytes)) decodeWavFeatures(bytes)
              .getOrElse(stubDecodeFeatures(bytes)).toSeq
            else stubDecodeFeatures(bytes).toSeq
          Row(r.getLong(0), r.getString(1),
            if (bytes == null) 0L else bytes.length.toLong,
            features)
        }
      }
    media.sparkSession.createDataFrame(rdd, out)
  }

  /** q52's operator: encode a deterministic PNG per row (the ingest
    * stand-in) and run it through the REAL decoder — one codec
    * context per partition, no shuffle. Output (id, width, height,
    * hist) is exactly recomputable from the pixel formula, so a SQL
    * oracle can gate the decoder's actual output values.
    */
  def pngRoundTripFeatures(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("hist", ArrayType(DoubleType))))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h, hist) = decodePngFeatures(syntheticPng(id))
          .getOrElse(throw new IllegalStateException(
            s"PNG round-trip failed for id $id"))
        Row(id, w, h, hist.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** ViT-style patch grid over decoded pixels: the image splits into
    * `patch`×`patch` tiles (the vision-transformer tokenization) and
    * each patch reports exact integer intensity stats (sum/min/max) —
    * the per-patch feature pass a vision data pipeline runs before
    * embedding. REAL decode (JDK ImageIO) per row with one codec
    * context per partition, no shuffle; the deterministic synth makes
    * the decoder's actual pixel values SQL-recomputable, so the whole
    * decode→patch path hash-gates (the q52 discipline).
    */
  def pngPatchGrid(df: DataFrame, idCol: String, patch: Int): DataFrame = {
    require(patch >= 1)
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("patch_row", LongType),
      StructField("patch_col", LongType),
      StructField("px_sum", LongType),
      StructField("px_min", LongType),
      StructField("px_max", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(syntheticPng(id)))
        val (w, h) = (img.getWidth, img.getHeight)
        for {
          pr <- 0 until h / patch
          pc <- 0 until w / patch
        } yield {
          var s = 0L; var mn = 255L; var mx = 0L
          var dx = 0
          while (dx < patch) {
            var dy = 0
            while (dy < patch) {
              val v = (img.getRGB(pc * patch + dx, pr * patch + dy)
                & 0xFF).toLong
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              dy += 1
            }
            dx += 1
          }
          Row(id, pr.toLong, pc.toLong, s, mn, mx)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Explode sampled frames relationally: (media_id, frame_idx,
    * frame_bytes) rows ready for a per-frame model pass. Clip
    * containers get REAL demuxing (every `stride`-th framed payload);
    * unrecognized payloads keep the 256-byte-block stub.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", BinaryType)))
    val rdd = media.select(col("media_id"), col("bytes"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val frames =
            if (isClip(bytes))
              clipFrames(bytes).zipWithIndex.collect {
                case (f, idx) if idx % stride == 0 => (idx, f)
              }
            else stubSampleFrames(bytes, stride)
          frames.map { case (idx, chunk) => Row(r.getLong(0), idx, chunk) }
        }
      }
    media.sparkSession.createDataFrame(rdd, out)
  }

  /** q71's operator: encode a deterministic clip per row, demux it,
    * and run every SAMPLED frame through the real PNG decoder — the
    * video analog of q52/q63, one codec context per partition, no
    * shuffle. (media_id, frame_idx, width, height, hist) is exactly
    * recomputable from the per-frame pixel formula.
    */
  def clipRoundTripFrames(df: DataFrame, idCol: String,
      nFrames: Int = 3, stride: Int = 2): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("hist", ArrayType(DoubleType))))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        clipFrames(syntheticClip(id, nFrames)).zipWithIndex.collect {
          case (frame, idx) if idx % stride == 0 =>
            val (w, h, hist) = decodePngFeatures(frame)
              .getOrElse(throw new IllegalStateException(
                s"clip frame decode failed for id $id frame $idx"))
            Row(id, idx, w, h, hist.toSeq)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Metadata-only resize (images): pure column transform — the
    * payload transform would live in [[decodeFeatures]]'s partition
    * pass.
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))

  /** REAL pixel resize: decode a PNG payload and nearest-neighbor
    * resample the luminance plane to `outW`×`outH` — out(x, y) =
    * src(⌊x·w/outW⌋, ⌊y·h/outH⌋), the standard NN mapping, chosen
    * because it moves pixels without arithmetic: on a lossless codec
    * the output values equal source pixels exactly, so a SQL oracle
    * can replay the resample from the generating formula (q170).
    * Returns None for undecodable payloads.
    */
  def resamplePng(bytes: Array[Byte], outW: Int, outH: Int)
      : Option[Seq[(Int, Int, Int)]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some(for {
        x <- 0 until outW
        y <- 0 until outH
      } yield (x, y,
        img.getRGB(x * img.getWidth / outW, y * img.getHeight / outH) & 0xFF))
    } catch { case _: Exception => None }

  /** Encode→decode→resample round trip at row grain: one scalar pixel
    * row (id, x, y, v) per output coordinate, the shape a per-pixel
    * SQL oracle (and the driver's scalar-only hash harness) needs.
    * Same per-partition batch discipline as the other round trips —
    * the codec work rides the scan, the explode is outW·outH rows per
    * image, bounded by the target resolution, not the source.
    */
  def pngResizeRoundTrip(df: DataFrame, idCol: String,
      outW: Int, outH: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("x", IntegerType),
      StructField("y", IntegerType),
      StructField("v", IntegerType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        resamplePng(syntheticPng(id), outW, outH)
          .getOrElse(throw new IllegalStateException(
            s"PNG resize round-trip failed for id $id"))
          .map { case (x, y, v) => Row(id, x, y, v) }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Deterministic 9×8 grayscale "scene" PNG with NEAR-DUPLICATE
    * structure — the ingest stand-in for a crawled image corpus where
    * the same photo recurs with small edits (rescaled logo, cropped
    * banner, re-encoded thumbnail): `scenes` distinct base rasters
    * (pixel = (scene·17 + x·19 + y·23) mod 256, textured so dHash
    * bits carry signal), and per scene `variants` light edits that
    * invert the first `variant` pixels of row 0 (+128 mod 256). Docs
    * sharing (scene, variant) are byte-identical images; docs sharing
    * a scene across variants differ in ≤3 pixels — a small Hamming
    * perturbation of the fingerprint; different scenes are unrelated.
    * 9 wide because dHash compares horizontally adjacent pixels: a
    * 9×8 raster yields exactly 8×8 = 64 comparison bits.
    */
  def syntheticScenePng(seed: Long, scenes: Int = 16, variants: Int = 4,
      w: Int = 9, h: Int = 8): Array[Byte] = {
    val scene = Math.floorMod(seed, scenes.toLong)
    val variant = Math.floorMod(seed / scenes, variants.toLong).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val base = Math.floorMod(scene * 17 + x * 19 + y * 23, 256L)
        val v = (if (y == 0 && x < variant)
          Math.floorMod(base + 128, 256L) else base).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        y += 1
      }
      x += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Difference hash (dHash), the classic perceptual image
    * fingerprint: bit (y·(w−1)+x) = 1 iff pixel(x+1, y) > pixel(x, y)
    * on the luminance plane — gradient directions survive uniform
    * brightness shifts and mild re-encoding, which is what makes the
    * Hamming distance between dHashes a near-duplicate signal.
    * Production pipelines resample to 9×8 first; here the decode
    * itself yields the grid, and [[resamplePng]] is the documented
    * pre-step for larger sources. Returns None for undecodable
    * payloads or rasters too small to compare (w < 2).
    */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 2) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        require((w - 1) * h <= 64,
          s"dHash64 needs at most 64 comparison bits, got ${(w - 1) * h}")
        var hash = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            if ((img.getRGB(x + 1, y) & 0xFF) > (img.getRGB(x, y) & 0xFF))
              hash |= 1L << (y * (w - 1) + x)
            x += 1
          }
          y += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }

  /** q221's operator: encode the scene PNG per row, run it through
    * the REAL decoder, and fingerprint the decoded raster with
    * [[dHash64]] — one codec context per partition, no shuffle; the
    * fingerprint rides the scan exactly where a 100 TB pipeline
    * computes it (at ingest, persisted next to the payload so dedup
    * never touches image bytes again). Output carries the 64-bit
    * hash both whole (`dhash`, for banding) and split into unsigned
    * 32-bit halves (`dhash_hi`/`dhash_lo`, for arithmetic replay —
    * bit 63 would overflow a signed SQL BIGINT built by summing
    * bit·2^k).
    */
  def dhashRoundTrip(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("dhash", LongType),
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val hash = dHash64(syntheticScenePng(id))
          .getOrElse(throw new IllegalStateException(
            s"dHash round-trip failed for id $id"))
        Row(id, hash, hash >>> 32, hash & 0xFFFFFFFFL)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Deterministic mono WAV with NEAR-DUPLICATE structure — the audio
    * twin of [[syntheticScenePng]]: `scenes` base waveforms
    * (sample(i) = ((scene·31 + i·7) mod 65536) − 32768) and per scene
    * `variants` light edits that offset the first `variant` samples
    * by a large constant (the stand-in for a re-encoded jingle with a
    * clipped intro). 130 samples = 65 two-sample energy windows =
    * exactly 64 envelope-comparison bits.
    */
  def syntheticSceneWav(seed: Long, scenes: Int = 16, variants: Int = 4,
      n: Int = 130, sampleRate: Int = 8000): Array[Byte] = {
    val scene = Math.floorMod(seed, scenes.toLong)
    val variant = Math.floorMod(seed / scenes, variants.toLong).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(n * 2)
    var i = 0
    while (i < n) {
      val bump = if (i < variant) 31337L else 0L
      bb.putShort(
        (Math.floorMod(scene * 31 + i * 7 + bump, 65536L) - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Energy-envelope fingerprint, the Shazam-family acoustic hash in
    * miniature: the decoded PCM stream splits into `windows`+1
    * two-sample windows, E_w = Σ s², and bit w = 1 iff E_{w+1} > E_w
    * — the direction of loudness change, which survives level scaling
    * and mild re-encoding the way dHash survives brightness shifts.
    * Integer energies (samples ≤ 2^15 ⇒ E ≤ 2^31) keep the gate
    * float-free. Returns None for undecodable payloads or streams
    * shorter than 2·(windows+1) samples.
    */
  def audioFingerprint64(bytes: Array[Byte], windows: Int = 64): Option[Long] =
    readPcm16(bytes).flatMap { case (_, sb) =>
      if (sb.remaining() < 2 * (windows + 1)) None
      else {
        val e = new Array[Long](windows + 1)
        var w = 0
        while (w < windows + 1) {
          val a = sb.get().toLong; val b = sb.get().toLong
          e(w) = a * a + b * b
          w += 1
        }
        var hash = 0L
        var k = 0
        while (k < windows) {
          if (e(k + 1) > e(k)) hash |= 1L << k
          k += 1
        }
        Some(hash)
      }
    }

  /** q223's operator: encode the scene WAV per row, decode it with
    * the REAL JDK codec, and fingerprint the decoded samples — same
    * scan-riding, shuffle-free discipline as [[dhashRoundTrip]], same
    * unsigned-half split for SQL replay. At 100 TB the 8-byte
    * fingerprint persists beside the payload at ingest; audio dedup
    * then runs entirely in Hamming space via
    * [[graft.operators.Dedup.hashNearDupPairs]].
    */
  def audioFingerprintRoundTrip(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("afp", LongType),
      StructField("afp_hi", LongType),
      StructField("afp_lo", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val hash = audioFingerprint64(syntheticSceneWav(id))
          .getOrElse(throw new IllegalStateException(
            s"audio fingerprint round-trip failed for id $id"))
        Row(id, hash, hash >>> 32, hash & 0xFFFFFFFFL)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Clip container over TEXTURED frames: frame f is the scene PNG
    * of seed+f ([[syntheticScenePng]]), so consecutive seeds share
    * nFrames−1 frames — the re-posted-video overlap structure —
    * while every frame stays perceptually distinctive. The plain
    * [[syntheticClip]]'s linear-ramp frames are the wrong payload
    * for FINGERPRINT work: a ramp has a constant gradient, so most
    * ramps dHash to the same all-ones value and a join on the
    * fingerprint would pile the corpus onto one key (exactly the
    * skew a content-addressable design must not have).
    */
  def syntheticSceneClip(seed: Long, nFrames: Int = 3): Array[Byte] = {
    val frames = (0 until nFrames).map(f => syntheticScenePng(seed + f))
    val bb = java.nio.ByteBuffer.allocate(4 + frames.map(4 + _.length).sum)
    bb.put(ClipMagic)
    frames.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  /** q224's operator: demux the REAL clip container, decode every
    * frame with the real PNG codec, and dHash each frame — (id,
    * frame_idx, fp) rows, the content-addressable form of a video
    * corpus. Clip-level near-dup is then a plain equi-join on the
    * fingerprint VALUE (clips sharing ≥k frame hashes), never an
    * all-pairs scan: the same join-on-content shape as segment-level
    * text dedup, which is what survives 100 TB of video. Key-skew
    * bound: fingerprint cardinality tracks distinct frame CONTENT
    * (see [[syntheticSceneClip]]), so a key's fan-in is the true
    * repost count of that frame, not an artifact of the hash.
    */
  def clipFrameFingerprints(df: DataFrame, idCol: String,
      nFrames: Int = 3): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("fp", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        clipFrames(syntheticSceneClip(id, nFrames)).zipWithIndex.map {
          case (frame, idx) =>
            val fp = dHash64(frame).getOrElse(
              throw new IllegalStateException(
                s"clip frame fingerprint failed for id $id frame $idx"))
            Row(id, idx, fp)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Silence segmentation over the REAL decoded PCM stream (the
    * speech-pipeline pre-chunker: split long audio at silences, drop
    * dead air before feature extraction): consecutive runs of samples
    * with |s| < `threshold`, kept when at least `minRun` long. Runs
    * are computed in one forward pass inside the decoder loop — per
    * partition, no shuffle — and every output is an exact integer on
    * the synthetic sample formula, so the whole segmentation
    * hash-gates against a gaps-and-islands SQL replay (q249).
    * `first_start` is −1 when a row has no qualifying run.
    */
  /** Video-to-patches E2E: demux the clip container (REAL framing
    * walk), decode every frame (REAL JDK codec), and patch-tokenize
    * each decoded frame as [[pngPatchGrid]] — the full
    * video→frames→patches pass a multimodal training pipeline runs.
    * Per-partition codec contexts, no shuffle; frame seeds are
    * deterministic so the triple-decode chain stays SQL-recomputable.
    */
  def clipPatchGrid(df: DataFrame, idCol: String, nFrames: Int,
      patch: Int): DataFrame = {
    require(nFrames >= 1 && patch >= 1)
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", LongType),
      StructField("patch_row", LongType),
      StructField("patch_col", LongType),
      StructField("px_sum", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        clipFrames(syntheticClip(id, nFrames)).zipWithIndex.flatMap {
          case (png, f) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            val (w, h) = (img.getWidth, img.getHeight)
            for {
              pr <- 0 until h / patch
              pc <- 0 until w / patch
            } yield {
              var s = 0L
              var dx = 0
              while (dx < patch) {
                var dy = 0
                while (dy < patch) {
                  s += (img.getRGB(pc * patch + dx, pr * patch + dy)
                    & 0xFF).toLong
                  dy += 1
                }
                dx += 1
              }
              Row(id, f.toLong, pr.toLong, pc.toLong, s)
            }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Per-frame audio features over REAL PCM decode: the classic VAD
    * pair — frame energy (Σ sample², exact long) and zero-crossing
    * count (sign flips between consecutive samples WITHIN the frame,
    * zero counted as non-negative) — per `frame`-sample window, plus
    * a `voiced` verdict (energetic and low-crossing). The speech/
    * music/noise triage a speech-data pipeline runs before ASR.
    * One codec context per partition; the deterministic synth keeps
    * the decoder's sample values SQL-recomputable (q249 discipline).
    */
  def wavFrameFeatures(df: DataFrame, idCol: String, frame: Int,
      minEnergy: Long, maxCrossings: Long): DataFrame = {
    require(frame >= 2)
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", LongType),
      StructField("energy", LongType),
      StructField("n_crossings", LongType),
      StructField("voiced", BooleanType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val sb = readPcm16(syntheticWav(id)).getOrElse(
          throw new IllegalStateException(
            s"WAV decode failed for id $id"))._2
        val samples = new Array[Long](sb.remaining())
        var i = 0
        while (sb.hasRemaining) { samples(i) = sb.get().toLong; i += 1 }
        (0 until samples.length / frame).map { f =>
          var e = 0L; var zc = 0L
          var j = f * frame
          while (j < (f + 1) * frame) {
            e += samples(j) * samples(j)
            if (j > f * frame &&
              (samples(j) >= 0) != (samples(j - 1) >= 0)) zc += 1
            j += 1
          }
          Row(id, f.toLong, e, zc, e >= minEnergy && zc <= maxCrossings)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  def silenceSegments(df: DataFrame, idCol: String, threshold: Int,
      minRun: Int): DataFrame = {
    require(threshold > 0 && minRun >= 1)
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("n_samples", LongType),
      StructField("n_silent", LongType),
      StructField("n_runs", LongType),
      StructField("max_run", LongType),
      StructField("first_start", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val sb = readPcm16(syntheticWav(id)).getOrElse(
          throw new IllegalStateException(
            s"WAV decode failed for id $id"))._2
        var n = 0L; var silent = 0L; var runs = 0L; var maxRun = 0L
        var firstStart = -1L; var cur = 0L; var curStart = -1L
        def closeRun(): Unit = if (cur >= minRun) {
          runs += 1; silent += cur
          if (cur > maxRun) maxRun = cur
          if (firstStart < 0) firstStart = curStart
        }
        while (sb.hasRemaining) {
          val s = sb.get().toLong
          if (math.abs(s) < threshold) {
            if (cur == 0) curStart = n
            cur += 1
          } else { closeRun(); cur = 0 }
          n += 1
        }
        closeRun()
        Row(id, n, silent, runs, maxRun, firstStart)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Append a `tEXt` chunk (keyword NUL text, per the PNG spec) just
    * before IEND, with a correct CRC32 over type+data — the write
    * half of the metadata round trip. The payload stays a VALID png:
    * strict decoders verify chunk CRCs, so the checksum is computed,
    * not faked.
    */
  def addPngTextChunk(png: Array[Byte], key: String,
      value: String): Array[Byte] = {
    require(isPng(png) && png.length >= 12)
    val data = (key + "\u0000" + value)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    crc.update(data)
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length)
    chunk.put("tEXt".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    chunk.put(data)
    chunk.putInt(crc.getValue.toInt)
    val iendAt = png.length - 12 // len(0) + "IEND" + crc
    val out = new Array[Byte](png.length + 12 + data.length)
    System.arraycopy(png, 0, out, 0, iendAt)
    System.arraycopy(chunk.array(), 0, out, iendAt, 12 + data.length)
    System.arraycopy(png, iendAt, out, iendAt + 12 + data.length, 12)
    out
  }

  /** REAL PNG container walk (the ISO-8859-1 metadata sidecar of an
    * image corpus — EXIF-class provenance without an external
    * library): iterate length/type/data/crc chunks from offset 8,
    * read width/height straight from IHDR bytes, and collect every
    * tEXt keyword/value pair. Returns (width, height, pairs).
    */
  def pngTextChunks(bytes: Array[Byte]): Option[(Int, Int, Seq[(String, String)])] = {
    if (!isPng(bytes)) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position(8)
      var w = -1; var h = -1
      val pairs = Seq.newBuilder[(String, String)]
      while (bb.remaining() >= 12) {
        val len = bb.getInt
        val tpe = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()),
          java.nio.charset.StandardCharsets.US_ASCII)
        val data = new Array[Byte](len)
        bb.get(data)
        bb.getInt // crc (validated by strict decoders; the walk trusts it)
        tpe match {
          case "IHDR" =>
            val ib = java.nio.ByteBuffer.wrap(data)
            w = ib.getInt; h = ib.getInt
          case "tEXt" =>
            val nul = data.indexOf(0.toByte)
            if (nul > 0) pairs += ((
              new String(data, 0, nul,
                java.nio.charset.StandardCharsets.ISO_8859_1),
              new String(data, nul + 1, len - nul - 1,
                java.nio.charset.StandardCharsets.ISO_8859_1)))
          case _ => ()
        }
      }
      if (w < 0) None else Some((w, h, pairs.result()))
    } catch { case _: Exception => None }
  }

  /** Histogram equalization over the REAL decoded PNG (the classic
    * contrast-normalization preprocessing step before visual feature
    * extraction), with the transform in EXACT integers: equalized
    * level e(v) = ((cdf(v) − cdf_min) · 255) div (n − cdf_min) — the
    * standard discrete formula, floor division, no floats — so the
    * per-image readout (min/max/sum of equalized pixels, distinct
    * levels before/after) hash-gates against a pixel-formula replay.
    * Decode + histogram + remap all run in the codec loop per
    * partition; nothing shuffles.
    */
  def equalizeStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("n_levels_in", LongType),
      StructField("n_levels_out", LongType),
      StructField("eq_min", LongType),
      StructField("eq_max", LongType),
      StructField("eq_sum", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(syntheticPng(id)))
        val (w, h) = (img.getWidth, img.getHeight)
        val n = w * h
        val hist = new Array[Int](256)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) { hist(img.getRGB(x, y) & 0xFF) += 1; y += 1 }
          x += 1
        }
        val cdf = hist.scanLeft(0)(_ + _).drop(1)
        val cdfMin = cdf.find(_ > 0).getOrElse(0)
        def eq(v: Int): Long =
          if (n == cdfMin) 0L
          else ((cdf(v) - cdfMin).toLong * 255L) / (n - cdfMin).toLong
        var (mn, mx, sum) = (Long.MaxValue, Long.MinValue, 0L)
        val outLevels = scala.collection.mutable.Set.empty[Long]
        var v = 0
        while (v < 256) {
          if (hist(v) > 0) {
            val e = eq(v)
            outLevels += e
            sum += e * hist(v)
            if (e < mn) mn = e
            if (e > mx) mx = e
          }
          v += 1
        }
        Row(id, hist.count(_ > 0).toLong, outLevels.size.toLong,
          mn, mx, sum)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Decimate-by-2 over the REAL decoded PCM stream (the cheap
    * anti-overkill resampler before acoustic featurization):
    * out(i) = (s(2i) + s(2i+1)) / 2 in Java integer division
    * (truncation toward zero — DuckDB's `//` agrees), odd tail
    * dropped. Integer stats gate against the sample-formula replay.
    */
  def decimateStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("n_out", LongType),
      StructField("d_min", LongType),
      StructField("d_max", LongType),
      StructField("d_sum", LongType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val sb = readPcm16(syntheticWav(id)).getOrElse(
          throw new IllegalStateException(
            s"WAV decode failed for id $id"))._2
        var (n, mn, mx, sum) = (0L, Long.MaxValue, Long.MinValue, 0L)
        while (sb.remaining() >= 2) {
          val d = (sb.get().toLong + sb.get().toLong) / 2L
          n += 1; sum += d
          if (d < mn) mn = d
          if (d > mx) mx = d
        }
        Row(id, n, mn, mx, sum)
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** Keyframe detection over the demuxed clip: per consecutive frame
    * pair, the L1 pixel-difference energy from the REAL per-frame PNG
    * decodes; a frame is a keyframe when its diff energy exceeds
    * `threshold` (scene cut vs continuation). Exact integers on the
    * synthetic pixel formula, so the flag table hash-gates — the
    * temporal-analysis step between q71's frame decode and q224's
    * frame fingerprints.
    */
  def keyframeStats(df: DataFrame, idCol: String, nFrames: Int,
      threshold: Long): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("diff_sum", LongType),
      StructField("is_keyframe", BooleanType, nullable = false)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        val frames = clipFrames(syntheticClip(id, nFrames)).map { b =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b))
          val (w, h) = (img.getWidth, img.getHeight)
          val px = new Array[Int](w * h)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) { px(x * h + y) = img.getRGB(x, y) & 0xFF; y += 1 }
            x += 1
          }
          px
        }
        frames.sliding(2).zipWithIndex.map { case (pair, i) =>
          val diff = pair(0).zip(pair(1))
            .map { case (a, b) => math.abs(a - b).toLong }.sum
          Row(id, i + 1, diff, diff > threshold)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** q250's operator: stamp two provenance tEXt chunks into each
    * row's synthetic PNG, then re-parse them with the REAL container
    * walk — one row per recovered chunk. Injection and extraction are
    * independent code paths over the actual byte layout (writer
    * splices before IEND with a computed CRC; reader walks
    * length/type/data frames), so the gate proves the container
    * format, not a shared in-memory map.
    */
  def pngMetadataRoundTrip(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("chunk_key", StringType),
      StructField("chunk_value", StringType)))
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        val png = addPngTextChunk(
          addPngTextChunk(syntheticPng(id), "Comment", s"doc-$id"),
          "Source", s"synthetic-${id % 10}")
        val (w, h, pairs) = pngTextChunks(png).getOrElse(
          throw new IllegalStateException(
            s"PNG metadata round-trip failed for id $id"))
        pairs.map { case (k, v) => Row(id, w, h, k, v) }
      }
    }
    df.sparkSession.createDataFrame(rdd, out)
  }
}
