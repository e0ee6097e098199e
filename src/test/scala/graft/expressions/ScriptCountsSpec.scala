package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** The one-pass character walk must agree EXACTLY with the per-class
  * regexp_count form it replaces — fixed-seed fuzz over mixed-script
  * text (Latin, Cyrillic, Greek, Arabic, CJK, Hangul, digits,
  * punctuation, supplementary-plane emoji), plus null/empty edges.
  */
class ScriptCountsSpec extends SparkSpec {

  private val classes = TextAnalysis.ScriptClasses.map(_._2)

  test("single pass equals six regexp_count passes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val pool = "abcXYZ ×÷ñü абвГД αβΩ اية 中文字 한국어 0129 .,!? 😀🎉"
      .toCharArray // includes surrogate pairs split into units on purpose
    val texts = (0 until 300).map { _ =>
      new String((0 until rnd.nextInt(80)).map(_ =>
        pool(rnd.nextInt(pool.length))).toArray)
    } ++ Seq("", "plain ascii", "а", "中", null)
    val df = texts.toDF("text")
    val rows = df.select(
      ScriptCounts.counts(col("text"), classes).as("fast"),
      array(classes.map(ivs => regexp_count(col("text"),
        lit(TextAnalysis.scriptClassRegex(ivs))).cast("int")): _*)
        .as("slow"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.getSeq[Any](1).forall(_ == null))
      else assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }

  test("interpreted eval and dominantScript argmax") {
    val e = ScriptCounts(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc абвг 中"),
        org.apache.spark.sql.types.StringType), classes)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    // latin 3, cyrl 4, grek 0, arab 0, cjk 1, hang 0
    assert(got.array.toSeq === Seq(3, 4, 0, 0, 1, 0))
    import spark.implicits._
    val names = TextAnalysis.ScriptClasses.map(_._1)
    val out = Seq(
      ("abc абвг 中", ""), ("", ""), ("가가 ΩΩ", ""), ("x ж", ""))
      .toDF("text", "pad")
      .select(TextAnalysis.scriptCounts(col("text")).as("sc"))
      .select(TextAnalysis.dominantScript(
        names.indices.map(i => col("sc")(i))).as("script"))
      .collect().map(_.getString(0)).toSeq
    // cyrl wins 4>3; all-zero → none; hang==grek tie → priority order
    // puts grek first... (grek precedes hang in ScriptClasses); latin
    // ties cyrl at 1 → latin by priority
    assert(out === Seq("cyrl", "none", "grek", "latin"))
  }
}
