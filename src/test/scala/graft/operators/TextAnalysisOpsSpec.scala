package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-corpus checks for the vocabulary-coverage audit. */
class TextAnalysisOpsSpec extends SparkSpec {

  import spark.implicits._

  test("vocabCoverage: deterministic top-k vocab, per-group OOV ppm") {
    // corpus counts: common×4, mid×3, rare×1, odd×1 — vocabSize=2
    // keeps {common, mid}; the rank-2 tie between rare/odd never
    // arises here, but the tie at the cut IS exercised below
    val docs = Seq(
      ("g1", "common common mid rare"),
      ("g2", "common COMMON mid mid odd"),
      ("g3", "")).toDF("src", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text", "src", 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("g1") === ((4L, 1L, 250000L))) // rare is OOV
    assert(got("g2") === ((5L, 1L, 200000L))) // case-folded; odd is OOV
    assert(!got.contains("g3"))               // zero-token group absent

    // tie at the vocabulary boundary: counts equal ⇒ token order
    // decides (ascending), so 'aa' enters and 'zz' stays OOV
    val tie = Seq(("g", "aa zz aa zz")).toDF("src", "text")
    val t = TextAnalysis.vocabCoverage(tie, "text", "src", 1)
      .collect().head
    assert((t.getLong(1), t.getLong(2)) === ((4L, 2L)))
  }

  test("readability: hand-computed Flesch milli, sentence floor, empty text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat."),      // W=3 S=1 Y=2 (e-a, a-o? no: 'e','a','a' → runs: e,a,a = 3? compute below)
      (2L, "no terminator here"), // S floors to 1
      (3L, "")).toDF("id", "text")
    val got = TextAnalysis.readability(docs, "text")
      .select("id", "n_words", "n_sentences", "n_syllables", "flesch_milli")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    // "the cat sat." vowel runs: e, a, a → 3
    val f1 = 206835L - (1015L * 3) / 1 - (84600L * 3) / 3
    assert(got(1L) === ((3L, 1L, 3L, Some(f1))))
    // "no terminator here": runs no→o; terminator→e,i,a,o; here→e,e → 7
    val f2 = 206835L - (1015L * 3) / 1 - (84600L * 7) / 3
    assert(got(2L) === ((3L, 1L, 7L, Some(f2))))
    assert(got(3L) === ((0L, 1L, 0L, None))) // zero words ⇒ NULL score
  }

  test("corrStats: exact sums, covariance numerator sign, null-pair exclusion") {
    import spark.implicits._
    // y = 2x (perfect positive): cov_num = n·Σxy − ΣxΣy = 3·28 − 6·12 = 12
    val df = Seq(
      ("g", Some(1L), Some(2L)), ("g", Some(2L), Some(4L)),
      ("g", Some(3L), Some(6L)), ("g", Some(9L), None) // excluded
    ).toDF("grp", "x", "y")
    val r = Aggregates.corrStats(df, "grp", col("x"), col("y"))
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((3L, 6L, 12L, 14L, 56L, 28L, 12L)))
    // anti-correlated: negative numerator
    val df2 = Seq(("g", 1L, 3L), ("g", 2L, 2L), ("g", 3L, 1L))
      .toDF("grp", "x", "y")
    val r2 = Aggregates.corrStats(df2, "grp", col("x"), col("y"))
      .collect().head
    assert(r2.getLong(7) === -6L)
  }

  test("sentences: terminator runs, remainders, whitespace collapse") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two. Three!  Four?unspaced tail"), // remainder sentence
      (2L, "No terminator at all"),                // whole doc = 1 sent
      (3L, "Ellipsis... bang!!"),  // extra marks are skipped: the run
      (4L, ""), (5L, null.asInstanceOf[String]),   // needs a non-mark
      (6L, "  Lead \t and\nnewline.  ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sentences(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got((1L, 0L)) === "One two.")
    assert(got((1L, 1L)) === "Three!")
    assert(got((1L, 2L)) === "Four?")
    assert(got((1L, 3L)) === "unspaced tail")
    assert(got((2L, 0L)) === "No terminator at all")
    // "..." yields one sentence ("Ellipsis.") — the [^.!?]+ core means
    // a bare terminator can never start a match, so "..", "!" vanish
    assert(got((3L, 0L)) === "Ellipsis.")
    assert(got((3L, 1L)) === "bang!")
    assert(got.keys.count(_._1 == 3L) === 2)
    assert(!got.keys.exists(_._1 == 4L) && !got.keys.exists(_._1 == 5L))
    assert(got((6L, 0L)) === "Lead and newline.")
    // sent_idx is the pre-filter match position: contiguous here
    assert(got.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted ===
      Seq(0L, 1L, 2L, 3L))
  }

  test("repairMojibake: guards — non-latin1 and false-positive-free") {
    import spark.implicits._
    val garbled = "cafÃ©"              // "café" mis-decoded
    val cases = Seq(
      (1L, garbled),                             // repairable
      (2L, "café plain"),                   // clean: untouched
      (3L, garbled + " 中"),                 // >U+00FF: NOT latin-1
                                                 // round-trippable → skip
      (4L, "Ãx no continuation"),           // digraph needs 80-BF
      (5L, ""), (6L, null.asInstanceOf[String]))
    val got = cases.toDF("id", "s").select(col("id"),
        TextAnalysis.mojibakeHits(col("s")).as("h"),
        TextAnalysis.repairMojibake(col("s")).as("r"))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          Option(r.getString(2)))).toMap
    assert(got(1L) === ((1L, Some("café"))))
    assert(got(2L) === ((0L, Some("café plain"))))
    assert(got(3L) === ((1L, Some(garbled + " 中")))) // untouched
    assert(got(4L) === ((0L, Some("Ãx no continuation"))))
    assert(got(5L) === ((0L, Some(""))))
    assert(got(6L) === ((-1L, None)))
  }
}
