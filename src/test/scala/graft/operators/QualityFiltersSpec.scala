package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Quality-filter operators on controlled fixtures: repetition math on
  * hand-countable documents, scrub behavior on adversarial PII shapes
  * the synthetic corpus can't produce, and containment on planted
  * overlap. (q81–q83 gate the same math against DuckDB at corpus
  * scale.)
  */
class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("ngramRepetition: exact fractions on hand-counted docs") {
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab -> 5 total, 2 distinct, top=3
      (2L, "w x y z"),            // wx xy yz -> all distinct
      (3L, "r"),                  // shorter than n: one whole-text gram
      (4L, "")                    // empty: one empty gram
    ).toDF("doc_id", "text")
    val got = QualityFilters.ngramRepetition(docs, "doc_id", "text", 2)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got(0) === ((1L, 5L, 2L, 3L, 1.0 - 2.0 / 5.0, 3.0 / 5.0)))
    assert(got(1) === ((2L, 3L, 3L, 1L, 0.0, 1.0 / 3.0)))
    assert(got(2) === ((3L, 1L, 1L, 1L, 0.0, 1.0)))
    assert(got(3) === ((4L, 1L, 1L, 1L, 0.0, 1.0)))
  }

  test("scrubPii: redacts emails and phones, leaves near-misses alone") {
    val rows = Seq(
      "mail a.user+tag@sub.example.org today",
      "call 555-123-4567 or 555-000-1111.",
      // email whose local part is phone-shaped: counts see both (the
      // raw text does contain a phone-shaped run, bounded by '@'),
      // but the scrub's email-first order redacts it as ONE email
      "ping 555-123-4567@relay.example.com ok",
      // near-misses: 12-digit run (no \\b match inside), bare domain
      "id 555-123-45678 and example.com stay",
      "nothing here")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = rows.select(col("id"),
        QualityFilters.emailCount(col("text")).as("e"),
        QualityFilters.phoneCount(col("text")).as("p"),
        QualityFilters.scrubPii(col("text")).as("s"))
      .orderBy(col("id")).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got(0) === ((1, 0, "mail <EMAIL> today")))
    assert(got(1) === ((0, 2, "call <PHONE> or <PHONE>.")))
    assert(got(2) === ((1, 1, "ping <EMAIL> ok")))
    assert(got(3) === ((0, 0, "id 555-123-45678 and example.com stay")))
    assert(got(4) === ((0, 0, "nothing here")))
  }

  test("contamination: planted overlap fractions") {
    // benchmark holds bigrams of "a b c"; corpus docs overlap fully,
    // partially ("b c" shared, "c x"/"x y" not), and not at all
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c"),       // 2/2 bigrams contaminated
      (2L, "b c x y"),     // bc of {bc,cx,xy}
      (3L, "p q r")        // 0/2
    ).toDF("doc_id", "text")
    val got = QualityFilters.contamination(corpus, bench, "doc_id", "text", 2)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) === ((1L, 2L, 2L, 1.0)))
    assert(got(1) === ((2L, 3L, 1L, 1.0 / 3.0)))
    assert(got(2) === ((3L, 2L, 0L, 0.0)))
  }
}
