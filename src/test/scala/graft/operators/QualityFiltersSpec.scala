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

  test("gopherRules: metrics and threshold flag on crafted docs") {
    import spark.implicits._
    val good = (1 to 60).map(i => s"word$i").mkString(" ") // 60 clean words
    val bullets = "- one\n- two\n- three\n- four"          // 100% bullet lines
    val dups = "same line\nsame line\nsame line\nother"    // 3 dup of 4
    val docs = Seq(
      (1L, good), (2L, bullets), (3L, dups), (4L, ""), (5L, null))
      .toDF("doc_id", "text")
    val m = QualityFilters.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc1: words "wordN" → mean len 5.xx, all alphabetic, one line
    assert(m(1L).getLong(1) === 60L)
    assert(m(1L).getLong(3) === 1000000L)        // alpha_word_ppm
    assert(m(1L).getLong(5) === 1L)              // n_lines
    assert(m(1L).getBoolean(9))                  // gopher_pass
    // doc2: 4 lines, every one a bullet → 1e6 ppm, fails (words < 50)
    assert(m(2L).getLong(5) === 4L)
    assert(m(2L).getLong(6) === 1000000L)        // bullet_line_ppm
    assert(!m(2L).getBoolean(9))
    // doc3: 4 lines, 2 distinct → dup ppm = (4-2)/4 = 500000
    assert(m(3L).getLong(8) === 500000L)
    assert(!m(3L).getBoolean(9))
    // empty and null text: zero words, one (empty) line, no pass
    for (id <- Seq(4L, 5L)) {
      assert(m(id).getLong(1) === 0L && m(id).getLong(5) === 1L)
      assert(!m(id).getBoolean(9))
    }
  }

  test("gopherRules counts the Unicode ellipsis as symbol and line end") {
    import spark.implicits._
    val docs = Seq((1L, "read more… now\nthe end…"),
      (2L, "plain text line")).toDF("doc_id", "text")
    val m = QualityFilters.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc1: 2 ellipsis symbols over 5 words; line 2 of 2 ends with …
    assert(m(1L).getLong(4) === 2000000L / 5)  // symbol_word_ppm
    assert(m(1L).getLong(7) === 500000L)       // ellipsis_line_ppm
    assert(m(2L).getLong(4) === 0L && m(2L).getLong(7) === 0L)
  }

  test("c4Rules: line ratios, sentence floor, page drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "This is fine. It has sentences! Three of them?"),
      (2L, "json blob { not prose. More. Even more."),      // brace drop
      (3L, "Lorem Ipsum dolor sit. Yes. Ok."),              // lorem drop
      (4L, "short\nalso short\nA full sentence right here."),
      (5L, null)).toDF("doc_id", "text")
    val m = QualityFilters.c4Rules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(4) === 3L && m(1L).getBoolean(7))   // keeps
    assert(m(2L).getBoolean(5) && !m(2L).getBoolean(7))      // has_brace
    assert(m(3L).getBoolean(6) && !m(3L).getBoolean(7))      // has_lorem
    // doc4: 3 lines, 1 ends in '.', two are <5 words
    assert(m(4L).getLong(1) === 3L)
    assert(m(4L).getLong(2) === 1000000L / 3)                // term ppm
    assert(m(4L).getLong(3) === 2000000L / 3)                // short ppm
    assert(!m(4L).getBoolean(7))                             // 1 sentence
    assert(m(5L).getLong(4) === 0L && !m(5L).getBoolean(7))  // null text
  }

  test("blocklistMatch: n-gram exact, case-folded, every doc gets a verdict") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Bad Phrase here and bad phrase again"),
      (2L, "badphrase joined is no match"),
      (3L, "clean text entirely"),
      (4L, "solo bad here")).toDF("id", "t")
    val ph = Seq("bad phrase", "solo").toDF("p")
    val got = QualityFilters.blocklistMatch(docs, "id", "t", ph, "p")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3),
          r.getBoolean(4)))).toMap
    assert(got(1L) === ((2L, 1L, "bad phrase", true))) // both occurrences
    assert(got(2L) === ((0L, 0L, "", false)))          // token-exact only
    assert(got(3L) === ((0L, 0L, "", false)))
    assert(got(4L) === ((1L, 1L, "solo", true)))
    // empty dictionary → all clean, still one row per doc
    val none = QualityFilters.blocklistMatch(docs, "id", "t",
      Seq.empty[String].toDF("p"), "p")
    assert(none.count() === 4L &&
      none.filter(col("blocked")).count() === 0L)
  }
}
