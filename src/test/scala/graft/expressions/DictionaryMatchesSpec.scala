package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityFilters

/** Token-level Aho–Corasick: hand-traced automaton cases (overlap,
  * nesting, fail-link chains, repeats) plus full-output parity with
  * the join-based blocklistMatch on a mixed corpus.
  */
class DictionaryMatchesSpec extends SparkSpec {
  import spark.implicits._

  private def matchesOf(text: String, phrases: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(DictionaryMatches.matches(col("t"), phrases).as("m"))
      .collect().head.getAs[scala.collection.Seq[String]](0).toSeq

  test("overlapping and nested phrases all match, in position order") {
    // "a b c d": "a b" at 1, "b c" at 2, "a b c" at 1 — overlap AND
    // nesting; emission is end-position order, sorted within one end
    val got = matchesOf("a b c d", Seq("a b", "b c", "a b c", "zz"))
    assert(got === Seq("a b", "a b c", "b c"))
  }

  test("fail-link chain: suffix restart finds the straddling phrase") {
    // after failing "x a b q" the automaton must restart mid-stream
    // and still catch "b q z" via the fail path — the case a naive
    // reset-to-root scan misses
    val got = matchesOf("x a b q z", Seq("x a b c", "b q z"))
    assert(got === Seq("b q z"))
  }

  test("repeats count per occurrence; case-folds; empty text empty") {
    assert(matchesOf("Spark spark SPARK", Seq("spark")) ===
      Seq("spark", "spark", "spark"))
    assert(matchesOf("  ", Seq("spark")) === Seq.empty)
    // dictionary phrases normalize too (case, surrounding blanks)
    assert(matchesOf("fast hash", Seq("  Fast   Hash ")) ===
      Seq("fast hash"))
  }

  test("parity with blocklistMatch on a mixed corpus") {
    val docs = Seq(
      (1L, "spark join fast hash value table part end"),
      (2L, "fast fast hash hash fast hash"),
      (3L, "value table value table part part"),
      (4L, "nothing here"),
      (5L, "")).toDF("doc_id", "text")
    val phrases = Seq("spark", "fast hash", "value table part")
    val viaJoin = QualityFilters.blocklistMatch(docs, "doc_id", "text",
        phrases.toDF("phrase"), "phrase")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val m = DictionaryMatches.matches(col("text"), phrases)
    val viaAc = docs.select(col("doc_id"), m.as("__m"))
      .select(col("doc_id"),
        size(col("__m")).cast("long").as("n_hits"),
        size(array_distinct(col("__m"))).cast("long").as("n_phrases"),
        array_join(array_sort(array_distinct(col("__m"))), "|")
          .as("phrases_hit"))
      .withColumn("blocked", col("n_hits") > 0)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaAc === viaJoin)
  }
}
