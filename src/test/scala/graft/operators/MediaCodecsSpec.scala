package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Instrumented codec: counts lifecycle calls so the spec can prove
  * the per-partition open/close contract (static counters — local
  * tests share one JVM).
  */
object CountingCodec extends MediaCodec {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val decodes = new AtomicInteger(0)
  val name = "counting"
  def accepts(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 && bytes(0) == 'C' && bytes(1) == 'C'
  override def open(): Unit = opens.incrementAndGet()
  override def close(): Unit = closes.incrementAndGet()
  def decode(bytes: Array[Byte]): Option[MediaCodecs.Decoded] = {
    decodes.incrementAndGet()
    if (bytes.length >= 3 && bytes(2) == '!') None // corrupt marker
    else Some(MediaCodecs.Decoded("counted", None, None, None, bytes.length.toLong))
  }
}

class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._
  import MediaCodecs._

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "bytes")

  test("registry dispatch routes each container to its codec") {
    val rows = Seq(
      1L -> Multimodal.syntheticPng(1L),
      2L -> Multimodal.syntheticWav(2L, n = 64, sampleRate = 8000),
      3L -> Multimodal.syntheticClip(3L, nFrames = 3),
      4L -> syntheticMp3(tagLen = 5, frames = 3),
      5L -> syntheticMp4(mdats = 2, mdatPayload = 12),
      6L -> "just some text".getBytes("UTF-8"))
    val got = decodeVia(mediaDf(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(6))))
      .toMap
    assert(got(1L) === (("png", "image", 1L)))
    assert(got(2L) === (("wav", "audio", 64L)))
    assert(got(3L) === (("clip", "video", 3L)))
    assert(got(4L) === (("mp3_ffi", "audio", 3L)))
    assert(got(5L) === (("mp4_ffi", "video", 2L)))
    assert(got(6L) === (("stub", "unknown", 0L)))
  }

  test("per-modality metadata is typed and nullable") {
    val rows = Seq(
      1L -> Multimodal.syntheticPng(1L),
      2L -> Multimodal.syntheticWav(2L, n = 10, sampleRate = 8000))
    val got = decodeVia(mediaDf(rows)).orderBy(col("media_id")).collect()
    assert(got(0).getInt(3) === 8 && got(0).getInt(4) === 8) // png raster
    assert(got(0).isNullAt(5))                               // png no rate
    assert(got(1).isNullAt(3) && got(1).isNullAt(4))         // wav no raster
    assert(got(1).getInt(5) === 8000)
  }

  test("ID3v2 synchsafe length: wire format and invalid high bit") {
    assert(Mp3FfiCodec.synchsafe(0, 0, 0, 0x7F.toByte) === Some(127))
    assert(Mp3FfiCodec.synchsafe(0, 0, 1, 0) === Some(128))
    assert(Mp3FfiCodec.synchsafe(0x01, 0, 0, 0) === Some(1 << 21))
    assert(Mp3FfiCodec.synchsafe(0, 0x80.toByte, 0, 0) === None)
  }

  test("torn MP3 tag (header promises more than exists) degrades to stub") {
    val torn = syntheticMp3(tagLen = 1000, frames = 0).take(40)
    val got = decodeVia(mediaDf(Seq(7L -> torn))).collect()(0)
    assert(got.getString(1) === "stub" && got.getString(2) === "unknown")
  }

  test("MP4 box walk stops at a torn box and keeps earlier mdats") {
    val whole = syntheticMp4(mdats = 3, mdatPayload = 4)
    // cut inside the LAST mdat box: its declared size now runs past
    // EOF, so the walk keeps the first two and stops
    val torn = whole.take(whole.length - 3)
    val got = decodeVia(mediaDf(Seq(8L -> torn))).collect()(0)
    assert(got.getString(1) === "mp4_ffi" && got.getLong(6) === 2L)
  }

  test("MP4 with no located mdat payloads degrades to stub") {
    val ftypOnly = syntheticMp4(mdats = 0, mdatPayload = 0)
    val got = decodeVia(mediaDf(Seq(9L -> ftypOnly))).collect()(0)
    assert(got.getString(1) === "stub")
  }

  test("crafted MP4 box size near Int.Max degrades to stub, no crash") {
    // valid 16-byte ftyp, then a box declaring size 0x7FFFFFF0: Int
    // arithmetic would wrap off+size negative, slip the bounds check
    // and index at a negative offset — the walk must read it as torn
    val payload = new Array[Byte](28)
    System.arraycopy(syntheticMp4(0, 0), 0, payload, 0, 16)
    payload(16) = 0x7F; payload(17) = 0xFF.toByte
    payload(18) = 0xFF.toByte; payload(19) = 0xF0.toByte
    payload(20) = 'm'; payload(21) = 'd'; payload(22) = 'a'; payload(23) = 't'
    val got = decodeVia(mediaDf(Seq(10L -> payload))).collect()(0)
    assert(got.getString(1) === "stub")
  }

  test("a codec that throws degrades the row to stub, not the partition") {
    object ThrowingCodec extends MediaCodec {
      val name = "boom"
      def accepts(bytes: Array[Byte]): Boolean =
        bytes != null && bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'
      def decode(bytes: Array[Byte]): Option[MediaCodecs.Decoded] =
        throw new RuntimeException("native decoder fault")
    }
    val rows = Seq(
      1L -> "BM broken".getBytes("UTF-8"),
      2L -> "fine".getBytes("UTF-8"))
    val got = decodeVia(mediaDf(rows), Seq(ThrowingCodec, StubCodec))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "stub", 2L -> "stub"))
  }

  test("lifecycle: open/close once per partition, corrupt rows degrade") {
    CountingCodec.opens.set(0); CountingCodec.closes.set(0)
    CountingCodec.decodes.set(0)
    val rows = (0 until 8).map { i =>
      val marker = if (i == 3) "CC!" else "CC-" // one corrupt payload
      i.toLong -> s"$marker payload $i".getBytes("UTF-8")
    }
    val df = mediaDf(rows).repartition(2)
    val got = decodeVia(df, Seq(CountingCodec, StubCodec)).collect()
    assert(got.length === 8)
    // every partition opened and closed the codec exactly once
    assert(CountingCodec.opens.get() === 2)
    assert(CountingCodec.closes.get() === 2)
    assert(CountingCodec.decodes.get() === 8)
    val byId = got.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(3L) === "stub")   // corrupt → stub row, partition survived
    assert(byId(4L) === "counting")
  }

  test("TiffCodec: LE parse, torn table, pointer-loop guard") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val header = "49492a00" + "08000000"
    val entry = "0001" + "0300" + "01000000" + "2a000000" // tag 256 SHORT 1 v42
    // one IFD, one entry, next = 0
    val ok = hx(header + "0100" + entry + "00000000")
    assert(MediaCodecs.TiffCodec.ifdEntries(ok) ===
      Seq((0L, 0L, 256L, 3L, 1L, 42L)))
    // torn: claims 2 entries, ships 1 → whole IFD dropped
    assert(MediaCodecs.TiffCodec.ifdEntries(
      hx(header + "0200" + entry)) === Seq.empty)
    // pointer loop: next-IFD points BACK at IFD0 (offset 8) → the
    // strictly-forward rule stops after one pass, no infinite walk
    val loop = hx(header + "0100" + entry + "08000000")
    assert(MediaCodecs.TiffCodec.ifdEntries(loop) ===
      Seq((0L, 0L, 256L, 3L, 1L, 42L)))
    // big-endian ("MM") and short headers are rejected outright
    assert(!MediaCodecs.TiffCodec.accepts(hx("4d4d002a08000000")))
    assert(!MediaCodecs.TiffCodec.accepts(hx("4949")))
    assert(MediaCodecs.TiffCodec.decode(ok).get.nFrames === 1L)
  }
}
