package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The one-pass counter must agree EXACTLY with the per-profile
  * regexp_count form it replaces — fixed-seed fuzz over text shaped
  * like the corpus (words, digits, punctuation, unicode, mixed case,
  * underscore-glued runs), plus the null/empty edges.
  */
class StopwordSetCountsSpec extends SparkSpec {

  private val profiles = Seq(
    TextAnalysis.LangProfiles.en, TextAnalysis.LangProfiles.de,
    TextAnalysis.LangProfiles.fr, TextAnalysis.LangProfiles.es)

  test("single pass equals four regexp_count passes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val vocab = TextAnalysis.LangProfiles.en ++ TextAnalysis.LangProfiles.de ++
      Seq("The", "AND", "theory", "band", "the_", "_the", "the1", "42",
        "naïve", "über", "渋谷", "a-b", "x")
    val seps = Seq(" ", "  ", ", ", ". ", "-", "—", "\n", "'", "\"")
    val texts = (0 until 300).map { _ =>
      (0 until rnd.nextInt(30)).map(_ =>
        vocab(rnd.nextInt(vocab.size)) + seps(rnd.nextInt(seps.size)))
        .mkString
    } ++ Seq("", "the", "the the the", "...", null)
    val df = texts.toDF("text")
    val rows = df.select(
      StopwordSetCounts.counts(col("text"), profiles).as("fast"),
      array(profiles.map(p =>
        TextAnalysis.stopwordCount(col("text"), p)): _*).as("slow"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0))
        // null text: the native form nulls the array, the portable
        // form is an array OF nulls — same information, per-element
        assert(r.getSeq[Any](1).forall(_ == null))
      else assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }

  test("interpreted and codegen paths agree") {
    import spark.implicits._
    // a filter above the projection forces a non-codegen eval path in
    // constant folding; spot-check via direct expression eval instead
    val e = StopwordSetCounts(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "The band and the theory of el niño und die la"),
        org.apache.spark.sql.types.StringType), profiles)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    // en: the×2(The,the) and×1 of×1 → 4; de: und×1 die×1 → 2;
    // fr: la×1 → 1; es: el×1 → 1  ("band","theory","niño" never count)
    assert(interp.array.toSeq === Seq(4, 2, 1, 1))
    val viaDf = Seq("The band and the theory of el niño und die la")
      .toDF("t")
      .select(StopwordSetCounts.counts(col("t"), profiles))
      .head.getSeq[Int](0)
    assert(viaDf === Seq(4, 2, 1, 1))
  }
}
