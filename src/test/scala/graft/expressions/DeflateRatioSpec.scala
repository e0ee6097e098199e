package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Behavioral contract of the compression-ratio signal (q120 is
  * rows-only gated — no SQL-portable zlib — so THIS is its gate).
  */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: String*): Seq[Double] =
    texts.toDF("t").select(TextAnalysis.compressionRatio(col("t")))
      .as[Double].collect().toSeq

  test("repetitive text compresses far below natural prose; noise above") {
    val repetitive = "spam ham " * 200
    val natural = ("the quick brown fox jumps over the lazy dog while " +
      "seventeen analysts review quarterly ingestion metrics near the " +
      "harbor before dawn and nobody mentions the missing shard ") * 4
    val Seq(r1, r2) = ratios(repetitive, natural)
    assert(r1 < 0.1, s"repetitive=$r1")
    assert(r2 > r1 * 3, s"natural=$r2 vs repetitive=$r1")
    assert(r2 < 1.0)
  }

  test("high-entropy noise sits far above repetitive text") {
    // hex noise carries ~4 bits/char, so ~0.5 is its deflate floor —
    // still 5×+ the repetitive ratio, which is the classifier margin
    val noisy = Seq.tabulate(300)(i =>
      Integer.toHexString(scala.util.hashing.MurmurHash3
        .stringHash(s"x$i"))).mkString("")
    val Seq(r, rep) = ratios(noisy, "spam ham " * 200)
    assert(r > 0.5, s"noise=$r")
    assert(r > rep * 5)
  }

  test("empty is 0, evaluation is deterministic, null propagates") {
    assert(ratios("") == Seq(0.0))
    val twice = ratios("some stable input text", "some stable input text")
    assert(twice(0) === twice(1))
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.compressionRatio(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("local zlib is byte-identical to the q120 oracle's authoring zlib") {
    // q120_compression_quality's oracle pins 500 deflate ratios
    // computed at AUTHORING time by CPython zlib
    // (compressobj(1, DEFLATED, -15)). Stock madler zlib and
    // java.util.zip.Deflater(BEST_SPEED, nowrap) emit byte-identical
    // streams, but a zlib-ng-backed build (some distros/JDKs link
    // system zlib) would not — which would make the q120 hash gate
    // silently environment-dependent (r14 ADVICE). This pin turns
    // that drift into a LOUD failure: the deflate ratio of a fixed
    // string under the exact q120 path must read 58/98 bytes, the
    // madler-zlib output.
    val pin = "the quick brown fox jumps over the lazy dog " +
      "the quick brown fox jumps over the lazy dog 0123456789"
    val Seq(r) = ratios(pin)
    assert(r === 58.0 / 98.0,
      s"pin string deflates to ratio $r, not 58/98: this JVM links a " +
        "divergent zlib (zlib-ng?) — q120's precomputed oracle VALUES " +
        "do not apply in this environment (expect a hash mismatch " +
        "there, not a code bug here)")
  }

  test("agrees between codegen and interpreted paths") {
    val df = Seq.tabulate(50)(i => s"doc $i " * (i + 1)).toDF("t")
    val gen = df.select(TextAnalysis.compressionRatio(col("t")))
      .as[Double].collect().toSeq
    val interp = df.collect().map(r =>
      DeflateUtil.ratio(org.apache.spark.unsafe.types.UTF8String
        .fromString(r.getString(0)))).toSeq
    assert(gen == interp)
  }
}
