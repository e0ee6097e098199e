package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, "image", ("A" * 300).getBytes("UTF-8")),
      (2L, "audio", Array.tabulate(1024)(i => (i % 256).toByte)),
      (3L, "video", Array.empty[Byte])
    ).toDF("media_id", "kind", "bytes")
  }

  test("stub decode: deterministic, fixed shape, L1-normalized") {
    val f1 = Multimodal.stubDecodeFeatures("hello world".getBytes)
    val f2 = Multimodal.stubDecodeFeatures("hello world".getBytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === Multimodal.FeatureDim)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("decodeFeatures preserves rows and emits fixed-dim vectors") {
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(2)).toSeq === Seq(300L, 1024L, 0L))
    assert(out.forall(_.getSeq[Float](3).length === Multimodal.FeatureDim))
    // 'A' = 0x41 → bucket 65*16/256 = 4 gets all mass for row 1
    assert(out(0).getSeq[Float](3)(4) === 1.0f)
    // empty payload → zero vector, not a crash
    assert(out(2).getSeq[Float](3).forall(_ === 0.0f))
  }

  test("sampleFrames strides over 256-byte blocks") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
      .groupBy("media_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 300B → 2 blocks → idx 0 kept; 1024B → 4 blocks → idx 0, 2
    assert(frames === Map(1L -> 1L, 2L -> 2L))
  }

  test("PNG decode is real: round-trips exact pixel values") {
    val bytes = Multimodal.syntheticPng(seed = 7L)
    assert(Multimodal.isPng(bytes))
    val Some((w, h, hist)) = Multimodal.decodePngFeatures(bytes)
    assert((w, h) === ((8, 8)))
    // recompute the histogram straight from the pixel formula — a
    // lossy or shifted decode cannot match
    val expected = new Array[Double](Multimodal.FeatureDim)
    for (i <- 0 until 64) expected(((7L * 31 + i) % 256).toInt / 16) += 1d / 64
    assert(hist.toSeq === expected.toSeq)
    // a PNG payload routes through the real decoder inside
    // decodeFeatures; non-PNG kinds keep the stub
    import spark.implicits._
    val df = Seq((9L, "image", Multimodal.syntheticPng(9L)))
      .toDF("media_id", "kind", "bytes")
    val feats = Multimodal.decodeFeatures(df)
      .select(col("features")).head.getSeq[Float](0)
    val exp9 = new Array[Float](Multimodal.FeatureDim)
    for (i <- 0 until 64) exp9(((9L * 31 + i) % 256).toInt / 16) += 1f / 64
    assert(feats === exp9.toSeq)
  }

  test("WAV decode is real: JDK codec round-trips exact sample values") {
    val bytes = Multimodal.syntheticWav(seed = 5L)
    assert(Multimodal.isWav(bytes) && !Multimodal.isPng(bytes))
    val Some(s) = Multimodal.decodeWavStats(bytes)
    // recompute every stat straight from the sample formula — a
    // shifted, truncated, or byte-swapped decode cannot match
    val samples = (0 until 64).map(i => ((5L * 31 + i * 7) % 65536) - 32768)
    assert(s === Multimodal.WavStats(8000L, 64L, samples.min, samples.max,
      samples.sum, samples.map(v => v * v).sum))
    // corrupt header → None (caller falls back to the stub)
    assert(Multimodal.decodeWavStats(bytes.take(20)).isEmpty)
    // negative seeds stay in Short range (floorMod, not %): the decode
    // still matches the documented formula instead of wrapping
    val Some(neg) = Multimodal.decodeWavStats(Multimodal.syntheticWav(-5L))
    val negSamples = (0 until 64).map(i =>
      Math.floorMod(-5L * 31 + i * 7, 65536L) - 32768L)
    assert((neg.sMin, neg.sMax, neg.sSum) ===
      ((negSamples.min, negSamples.max, negSamples.sum)))
    // a WAV payload routes through the real decoder inside
    // decodeFeatures: histogram of decoded samples, not raw bytes
    import spark.implicits._
    val df = Seq((3L, "audio", Multimodal.syntheticWav(3L)))
      .toDF("media_id", "kind", "bytes")
    val feats = Multimodal.decodeFeatures(df)
      .select(col("features")).head.getSeq[Float](0)
    val exp = new Array[Float](Multimodal.FeatureDim)
    for (i <- 0 until 64)
      exp((((3L * 31 + i * 7) % 65536).toInt * Multimodal.FeatureDim) / 65536) += 1f / 64
    assert(feats === exp.toSeq)
  }

  test("clip container: real demux + real per-frame PNG decode") {
    val clip = Multimodal.syntheticClip(seed = 11L, nFrames = 3)
    assert(Multimodal.isClip(clip))
    val frames = Multimodal.clipFrames(clip)
    assert(frames.length === 3)
    // every frame is an independently decodable REAL PNG whose pixels
    // follow the per-frame formula (seed + frame index)
    for ((f, idx) <- frames.zipWithIndex) {
      assert(Multimodal.isPng(f))
      val Some((w, h, hist)) = Multimodal.decodePngFeatures(f)
      assert((w, h) === ((8, 8)))
      val exp = new Array[Double](Multimodal.FeatureDim)
      for (i <- 0 until 64) exp((((11L + idx) * 31 + i) % 256).toInt / 16) += 1d / 64
      assert(hist.toSeq === exp.toSeq)
    }
    // torn tail truncates instead of throwing (demuxer semantics)
    assert(Multimodal.clipFrames(clip.dropRight(10)).length === 2)
    // sampleFrames dispatches clips to the demuxer: stride 2 of 3
    // frames keeps indexes 0 and 2 with the PNG payloads intact
    import spark.implicits._
    val media = Seq((4L, "video", Multimodal.syntheticClip(4L, 3)))
      .toDF("media_id", "kind", "bytes")
    val sampled = Multimodal.sampleFrames(media, 2)
      .select(col("frame_idx"), col("frame_bytes")).collect()
    assert(sampled.map(_.getInt(0)).sorted.toSeq === Seq(0, 2))
    assert(sampled.forall(r => Multimodal.isPng(r.getAs[Array[Byte]](1))))
  }

  test("JPEG: flat grayscale at quality 1.0 round-trips exactly, all values") {
    // the exactness claim q124's oracle rests on — every possible
    // flat-field value survives the lossy codec bit-exactly
    for (v <- 0 until 256) {
      val bytes = Multimodal.syntheticJpeg(seed = v.toLong * 33, w = 8, h = 8)
      // seed*33*31 mod 256 varies; instead pin the value directly:
      val expected = Math.floorMod(v.toLong * 33 * 31, 256L)
      assert(Multimodal.isJpeg(bytes))
      assert(!Multimodal.isPng(bytes) && !Multimodal.isWav(bytes))
      val Some((w, h, mn, mx, sum)) = Multimodal.decodeJpegGrayStats(bytes)
      assert((w, h) === ((8, 8)))
      assert(mn === expected && mx === expected, s"value $expected drifted")
      assert(sum === 64 * expected)
    }
  }

  test("GIF: textured ramp round-trips exactly for every wrap position") {
    // LZW over palette indices is lossless — the q141 oracle's claim.
    // Sweep seeds so the 64-pixel ramp starts at every residue,
    // including the >192 starts that wrap past 255.
    for (v <- 0 until 256) {
      val seed = v.toLong * 33 // seed*31 mod 256 covers all residues
      val bytes = Multimodal.syntheticGif(seed, w = 8, h = 8)
      assert(Multimodal.isGif(bytes))
      assert(!Multimodal.isJpeg(bytes) && !Multimodal.isPng(bytes))
      val Some((w, h, mn, mx, sum)) = Multimodal.decodeGifGrayStats(bytes)
      assert((w, h) === ((8, 8)))
      val px = (0 until 64).map(k => Math.floorMod(seed * 31 + k, 256L))
      assert(mn === px.min && mx === px.max && sum === px.sum,
        s"ramp at seed $seed drifted")
    }
  }

  test("JPEG: textured image decodes with bounded error (real DCT path)") {
    // a non-flat image exercises the full quantize/IDCT path; the
    // codec is lossy there, so the contract is bounded deviation
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until 8; y <- 0 until 8)
      img.getRaster.setSample(x, y, 0, (x * 8 + y * 29) % 256)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val maxErr = (for (x <- 0 until 8; y <- 0 until 8) yield
      math.abs(decoded.getRaster.getSample(x, y, 0) - ((x * 8 + y * 29) % 256))).max
    assert(maxErr > 0 || maxErr == 0) // decode ran; record the bound:
    assert(maxErr <= 16, s"quality-1.0 JPEG error $maxErr out of bound")
  }

  test("decodeFeatures dispatches JPEG payloads to the real image decoder") {
    import spark.implicits._
    val flat = Multimodal.syntheticJpeg(seed = 3L) // value 93: bucket 5
    val media = Seq((1L, "image", flat)).toDF("media_id", "kind", "bytes")
    val feats = Multimodal.decodeFeatures(media)
      .select(col("features")).collect().head.getSeq[Float](0)
    val expBucket = (Math.floorMod(3L * 31, 256L) * Multimodal.FeatureDim / 256).toInt
    assert(feats(expBucket) === 1.0f) // flat field: one full bucket
    assert(feats.sum === 1.0f)
  }

  test("resizeMeta rewrites metadata only") {
    import spark.implicits._
    val withMeta = media.withColumn("meta",
      struct(lit(640).as("width"), lit(480).as("height"),
        lit(null).cast("int").as("sample_rate"), lit(1).as("n_frames")))
    val out = Multimodal.resizeMeta(withMeta, 224, 224)
      .select(col("meta.width"), col("meta.height"), col("meta.n_frames"))
      .distinct().collect()
    assert(out.length === 1)
    assert((out.head.getInt(0), out.head.getInt(1), out.head.getInt(2)) === ((224, 224, 1)))
  }

  test("resamplePng nearest-neighbor matches the pixel formula") {
    val seed = 42L
    def px(x: Int, y: Int): Int = Math.floorMod(seed * 31 + x * 8 + y, 256L).toInt
    // downsample 8×8 → 4×4: out(x, y) = src(2x, 2y)
    val down = Multimodal.resamplePng(Multimodal.syntheticPng(seed), 4, 4).get
    assert(down.size === 16)
    down.foreach { case (x, y, v) => assert(v === px(x * 2, y * 2)) }
    // identity resample returns the source raster
    val same = Multimodal.resamplePng(Multimodal.syntheticPng(seed), 8, 8).get
    same.foreach { case (x, y, v) => assert(v === px(x, y)) }
    // upsample 8×8 → 16×16 repeats each source pixel 2×2
    val up = Multimodal.resamplePng(Multimodal.syntheticPng(seed), 16, 16).get
    up.foreach { case (x, y, v) => assert(v === px(x / 2, y / 2)) }
    // undecodable payload → None
    assert(Multimodal.resamplePng(Array[Byte](1, 2, 3), 4, 4).isEmpty)
  }

  test("dHash64 matches the gradient formula bit-for-bit") {
    // replay the scene formula independently of the codec: a wrong
    // decode, a flipped axis, or a wrong bit order all diverge
    def px(seed: Long)(x: Int, y: Int): Int = {
      val scene = Math.floorMod(seed, 16L)
      val variant = Math.floorMod(seed / 16, 4L).toInt
      val base = Math.floorMod(scene * 17 + x * 19 + y * 23, 256L)
      (if (y == 0 && x < variant) Math.floorMod(base + 128, 256L)
       else base).toInt
    }
    for (seed <- Seq(0L, 7L, 16L, 33L, 255L, 499L)) {
      val got = Multimodal.dHash64(Multimodal.syntheticScenePng(seed)).get
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (px(seed)(x + 1, y) > px(seed)(x, y)) want |= 1L << (y * 8 + x)
      assert(got === want, s"seed $seed")
    }
    // same (scene, variant) → identical fingerprint
    assert(Multimodal.dHash64(Multimodal.syntheticScenePng(3L)) ===
      Multimodal.dHash64(Multimodal.syntheticScenePng(3L + 64L)))
    // same scene, adjacent variant → small Hamming distance;
    // different scene → far
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val v0 = Multimodal.dHash64(Multimodal.syntheticScenePng(1L)).get
    val v1 = Multimodal.dHash64(Multimodal.syntheticScenePng(17L)).get
    val other = Multimodal.dHash64(Multimodal.syntheticScenePng(2L)).get
    assert(ham(v0, v1) <= 3)
    assert(ham(v0, other) > 3)
    // undecodable payload and too-narrow raster → None
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.dHash64(Multimodal.syntheticPng(1L, w = 1, h = 4)).isEmpty)
  }

  test("audioFingerprint64 matches the energy-envelope formula") {
    def sample(seed: Long)(i: Int): Long = {
      val scene = Math.floorMod(seed, 16L)
      val variant = Math.floorMod(seed / 16, 4L)
      val bump = if (i < variant) 31337L else 0L
      Math.floorMod(scene * 31 + i * 7 + bump, 65536L) - 32768L
    }
    for (seed <- Seq(0L, 9L, 17L, 100L, 499L)) {
      val got = Multimodal.audioFingerprint64(
        Multimodal.syntheticSceneWav(seed)).get
      val e = Array.tabulate(65) { w =>
        val a = sample(seed)(2 * w); val b = sample(seed)(2 * w + 1)
        a * a + b * b
      }
      var want = 0L
      for (k <- 0 until 64) if (e(k + 1) > e(k)) want |= 1L << k
      assert(got === want, s"seed $seed")
    }
    // same (scene, variant) → identical; adjacent variants → near
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val v0 = Multimodal.audioFingerprint64(Multimodal.syntheticSceneWav(2L)).get
    val v1 = Multimodal.audioFingerprint64(Multimodal.syntheticSceneWav(18L)).get
    assert(Multimodal.audioFingerprint64(
      Multimodal.syntheticSceneWav(2L + 64L)).contains(v0))
    assert(ham(v0, v1) <= 3)
    // too-short stream and garbage payload → None
    assert(Multimodal.audioFingerprint64(
      Multimodal.syntheticWav(1L, n = 64)).isEmpty)
    assert(Multimodal.audioFingerprint64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("clipFrameFingerprints: consecutive ids share exactly their overlapping frames") {
    import spark.implicits._
    val fps = Multimodal.clipFrameFingerprints(
        Seq(10L, 11L, 12L, 50L).toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fps.length === 12) // 4 clips × 3 frames
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // clip(seed) frames are scene pngs of seed, seed+1, seed+2: docs
    // 10 and 11 overlap on frame seeds {11, 12}; 10 and 12 on {12};
    // 10 and 50 on nothing (distinct scene images throughout)
    assert((byDoc(10L) & byDoc(11L)).size === 2)
    assert((byDoc(10L) & byDoc(12L)).size === 1)
    assert((byDoc(10L) & byDoc(50L)).isEmpty)
    // frame fingerprint = dHash of the standalone scene frame
    assert(byDoc(10L).contains(
      Multimodal.dHash64(Multimodal.syntheticScenePng(11L)).get))
    // textured frames keep the fingerprint space spread out — the
    // degenerate all-ones ramp hash must not appear (skew guard)
    assert(!fps.map(_._3).contains(-1L))
  }

  test("dhashRoundTrip splits the hash into consistent unsigned halves") {
    import spark.implicits._
    val out = Multimodal.dhashRoundTrip(
        Seq(0L, 5L, 21L, 300L).toDF("doc_id"), "doc_id")
      .orderBy("id").collect()
    assert(out.length === 4)
    out.foreach { r =>
      val (hash, hi, lo) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hi >= 0L && hi <= 0xFFFFFFFFL)
      assert(lo >= 0L && lo <= 0xFFFFFFFFL)
      assert(((hi << 32) | lo) === hash)
    }
  }

  test("silenceSegments matches a driver-side run-length reference") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 123L, 4096L)
    val got = Multimodal.silenceSegments(ids.toDF("doc_id"), "doc_id",
        threshold = 8192, minRun = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    ids.foreach { id =>
      val samples = (0 until 64).map(i =>
        Math.floorMod(id * 31 + i * 7, 65536L) - 32768L)
      var runs = List.empty[(Int, Int)] // (start, len)
      var cur = -1
      samples.zipWithIndex.foreach { case (s, i) =>
        if (math.abs(s) < 8192) { if (cur < 0) cur = i }
        else if (cur >= 0) { runs ::= ((cur, i - cur)); cur = -1 }
      }
      if (cur >= 0) runs ::= ((cur, 64 - cur))
      val kept = runs.reverse.filter(_._2 >= 2)
      val exp = (64L, kept.map(_._2.toLong).sum, kept.size.toLong,
        if (kept.isEmpty) 0L else kept.map(_._2).max.toLong,
        kept.headOption.map(_._1.toLong).getOrElse(-1L))
      assert(got(id) === exp, s"id $id")
    }
  }

  test("png tEXt chunks round-trip and keep the image decodable") {
    val png = Multimodal.addPngTextChunk(
      Multimodal.addPngTextChunk(Multimodal.syntheticPng(42L),
        "Comment", "hello world"),
      "Source", "unit-test")
    val Some((w, h, pairs)) = Multimodal.pngTextChunks(png)
    assert((w, h) === ((8, 8)))
    assert(pairs === Seq("Comment" -> "hello world",
      "Source" -> "unit-test"))
    // the spliced chunks carry a REAL CRC: the strict JDK decoder
    // still reads the image, pixels intact
    val Some((dw, dh, hist)) = Multimodal.decodePngFeatures(png)
    assert((dw, dh) === ((8, 8)) && math.abs(hist.sum - 1.0) < 1e-9)
    // a chunkless PNG yields no pairs; a non-PNG yields None
    assert(Multimodal.pngTextChunks(Multimodal.syntheticPng(1L))
      .exists(_._3.isEmpty))
    assert(Multimodal.pngTextChunks("nope".getBytes).isEmpty)
  }
}
