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
