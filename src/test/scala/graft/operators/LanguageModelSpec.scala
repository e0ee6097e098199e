package graft.operators

import graft.SparkSpec

/** Hand-computed bigram model + surprise scores (q100 gates the same
  * path against DuckDB at corpus scale).
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // doc1 bigrams: (a,b),(b,a),(a,b),(b,c); doc2: (a,b),(b,x)
  // c12: (a,b)=3 (b,a)=1 (b,c)=1 (b,x)=1; heads: c1(a)=3 c1(b)=3
  private def docs =
    Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")

  test("bigramCounts matches hand counts (c12 and head c1)") {
    val m = LanguageModel.bigramCounts(docs, "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(m == Map(
      "a b" -> ((3L, 3L)),
      "b a" -> ((1L, 3L)),
      "b c" -> ((1L, 3L)),
      "b x" -> ((1L, 3L))))
  }

  test("bigramKeys case-folds and matches the array bigrams on clean text") {
    import org.apache.spark.sql.functions._
    val mixed = Seq((1L, "Foo BAR foo")).toDF("doc_id", "text")
    val keys = mixed.select(LanguageModel.bigramKeys(col("text")))
      .collect().head.getAs[scala.collection.Seq[String]](0).toSeq
    assert(keys == Seq("foo bar", "bar foo"))
    // sub-2-token docs yield empty (the WordShingles whole-text
    // fallback must stay guarded off)
    val short = Seq((1L, "one"), (2L, " ")).toDF("doc_id", "text")
    assert(short.select(explode(LanguageModel.bigramKeys(col("text"))))
      .count() === 0)
  }

  test("surprise: truncated integer ppm, novelty = doc-exclusive bigrams") {
    val sc = LanguageModel
      .surprise(docs, LanguageModel.bigramCounts(docs, "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc1: (a,b)×2 @ 1000000 + (b,a) @ 333333 + (b,c) @ 333333;
    // novel = (b,a),(b,c) (their every corpus occurrence is in doc1 —
    // (a,b) has cd=2 < c12=3 so it is NOT novel)
    assert(sc(1L) == ((4L, 2666666L, 2L)))
    // doc2: (a,b) @ 1000000 + (b,x) @ 333333; (b,x) novel
    assert(sc(2L) == ((2L, 1333333L, 1L)))
  }

  test("cross-corpus scoring: unseen bigrams are ppm-0 novel, never dropped") {
    val model = LanguageModel.bigramCounts(docs, "text") // trained on a/b/c/x
    val heldOut = Seq((9L, "a b zz qq"), (10L, "qq rr")).toDF("doc_id", "text")
    val sc = LanguageModel.surprise(heldOut, model, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc9: (a,b) in-model @ 1000000; (b,zz) and (zz,qq) unseen → ppm 0,
    // novel; n_bigrams counts ALL THREE occurrences
    assert(sc(9L) == ((3L, 1000000L, 2L)))
    // doc10 is entirely out-of-model — it must still appear
    assert(sc(10L) == ((1L, 0L, 1L)))
  }

  test("docs with fewer than two tokens yield no bigram rows") {
    val tiny = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val model = LanguageModel.bigramCounts(tiny, "text")
    assert(model.count() === 0)
    assert(LanguageModel.surprise(tiny, model, "doc_id", "text").count() === 0)
  }

  test("trigramInterpolated: hand-computed ppm on a 3-doc corpus") {
    // unigrams a:3 b:3 c:3 x:1 y:1 → N=11; bigrams "a b":3 "b c":3
    // "c a":1 "x y":1; trigrams "a b c":3 "b c a":1 "c a b":1
    val docs = Seq(
      (1L, "a b c"),
      (2L, "x y"), // too short for trigrams → zeros
      (3L, "a b c a b c")).toDF("doc_id", "text")
    val out = LanguageModel.trigramInterpolated(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // "a b c": p3=1e6·3/3, p2("b c"|b)=1e6·3/3, p1(c)=1e6·3/11=272727
    //   → (5000000+3000000+545454) div 10 = 854545
    // "b c a": p3=333333, p2=333333, p1=272727 → 321211
    // "c a b": p3=1000000, p2=1000000, p1=272727 → 854545
    assert(out(1L) == ((1L, 854545L, 854545L)))
    assert(out(2L) == ((0L, 0L, 0L)))
    assert(out(3L) == ((4L, 2L * 854545 + 321211 + 854545, 321211L)))
  }

  test("charTrigramProfiles/classifyByProfiles: ranks and tie-breaks") {
    import spark.implicits._
    val train = Seq(
      ("aa", "xxxxy"),  // grams: xxx×2, xxy ×1
      ("bb", "zzzzy"),  // grams: zzz×2, zzy ×1
      ("bb", "tiny")    // tin, iny
    ).toDF("lang", "t")
    val prof = LanguageModel.charTrigramProfiles(train, "lang", "t",
        topM = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    // bb: zzz (2) ranks 1; tie at cnt 1 among {zzy, tin, iny} → gram
    // order picks "iny" for rank 2
    assert(prof.filter(_._1 == "bb").sortBy(_._4).map(_._2).toSeq ===
      Seq("zzz", "iny"))
    assert(prof.filter(_._1 == "aa").sortBy(_._4).map(_._2).toSeq ===
      Seq("xxx", "xxy"))

    val profiles = LanguageModel.charTrigramProfiles(train, "lang", "t",
      topM = 2)
    val test = Seq(
      (1L, "xxx"),      // hits aa only
      (2L, "zzziny"),   // hits bb twice (zzz + iny)
      (3L, "xxyzzz"),   // 1 hit each side → tie → label order: aa
      (4L, "qqqq"), (5L, "")) // no hits → absent
      .toDF("id", "t")
    val got = LanguageModel.classifyByProfiles(test, "id", "t", profiles)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("aa", 1L)))
    assert(got(2L) === (("bb", 2L)))
    assert(got(3L) === (("aa", 1L)))
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("pmiCollocations: planted collocation outranks chance pairs") {
    import org.apache.spark.sql.functions._
    // "san francisco" always co-occurs (perfect collocation); "the a"
    // pairs are chance-level. PMI(san francisco) = ln(N·c/(h·t)) with
    // h=t=c (san only precedes francisco) → ln(N/c) > 0.
    val docs = Seq.tabulate(12)(i =>
      s"san francisco the a the a x$i the a").toDF("text")
    val got = LanguageModel.pmiCollocations(docs, "text",
      minCount = 3L, k = 5).collect()
    assert(got.head.getString(0) === "san francisco")
    // exact value: N bigrams = 12*8=96, c12=h=t=12 → ln(96/12)=ln 8
    // → 2079441 ppm (truncating kernel, ±3)
    assert(math.abs(got.head.getLong(4) - 2079441L) <= 3)
    // every reported pair is positive-PMI and ranked desc
    val ppm = got.map(_.getLong(4)).toSeq
    assert(ppm.forall(_ > 0) && ppm === ppm.sorted.reverse)
  }

  test("tokenEntropy: uniform beats skewed; exact ppm-nats") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      ("u", "a b c d"),              // uniform over 4 → ln 4
      ("k", "a a a a a a b c"),      // skewed
      ("one", "z z z z")             // degenerate → 0
    ).toDF("source", "text")
    val got = LanguageModel.tokenEntropy(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("one") === ((4L, 1L, 0L)))
    // ln 4 = 1386294 ppm
    assert(got("u")._1 === 4L && got("u")._2 === 4L)
    assert(math.abs(got("u")._3 - 1386294L) <= 3)
    // skewed: (6·ln(8/6) + 1·ln8 + 1·ln8) / 8 = 735622 ppm-ish
    val hk = (6.0 * math.log(8.0 / 6) + 2 * math.log(8.0)) / 8 * 1e6
    assert(math.abs(got("k")._3 - hk) <= 5)
    assert(got("u")._3 > got("k")._3 && got("k")._3 > got("one")._3)
  }

  test("keyness: planted focus term tops G2; balanced terms near zero") {
    import org.apache.spark.sql.functions._
    val docs = (Seq.fill(6)(("f", "alpha beta gamma")) ++
      Seq.fill(6)(("r", "delta beta gamma"))).toDF("source", "text")
    val got = LanguageModel.keyness(docs, "source", "text",
      focus = "f", minCount = 2L, k = 10).collect()
    // alpha: a=6, b=0 — maximally key for focus; exact G² =
    // 2·6·ln 2 = 8317766 ppm (A=B=18 → ln(a/E_a) = ln 2)
    assert(got.head.getString(0) === "alpha")
    assert(math.abs(got.head.getLong(3) - 8317766L) <= 20)
    // beta/gamma are perfectly balanced → G² ~ 0 (truncation jitter)
    val m = got.map(r => r.getString(0) -> r.getLong(3)).toMap
    Seq("beta", "gamma").foreach { t =>
      assert(m.get(t).forall(_.abs <= 20), s"$t: ${m.get(t)}")
    }
    // delta (reference-only) is underrepresented → filtered out
    assert(!m.contains("delta"))
  }

  test("tokenGini: uniform 0, concentrated near 1, exact small case") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      ("u", "a b c d"),        // all counts 1 → G = 0
      ("k", "a a a a a a b"))  // counts {1, 6}: G_num = 2(1·1+2·6)−3·7=5
      .toDF("source", "text")
    val got = LanguageModel.tokenGini(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("u") === ((4L, 4L, 0L)))
    // gini = 5/(2·7) = 357142 ppm
    assert(got("k") === ((2L, 7L, 357142L)))
  }

  // KN fixture: c12 "a b"=3, "b a"=1, "b c"=1, "b x"=1;
  // heads a:(c1=3, n1p=1) b:(c1=3, n1p=3); tails b/a/c/x all n1p=1;
  // n_types=4, D=0.75 → pcont = 250000 ppm for every w2
  test("knBigramModel: hand-computed discounted + continuation ppm") {
    val m = LanguageModel.knBigramModel(docs, "text", 750000L)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("kn_ppm")).toMap
    // "a b": (3e6−750000)//3 + ((750000·1)//3 · 250000)//1e6
    //      = 750000 + 62500
    assert(m("a b") === 812500L)
    // "b ·": (1e6−750000)//3 + ((750000·3)//3 · 250000)//1e6
    //      = 83333 + 187500
    assert(m("b a") === 270833L)
    assert(m("b c") === 270833L)
    assert(m("b x") === 270833L)
    // discounted-mass identity for head b: observed 3·270833 plus the
    // unobserved-w2 backoff λ·pcont(b) = 750000·250000/1e6 = 187500
    // must reconstruct 10^6 up to per-term truncation (≤ 1 ppm each)
    val total = 3L * 270833L + 187500L
    assert(total <= 1000000L && total >= 999996L, s"mass $total")
  }

  test("knSurprise: per-doc sums, nats via the lnPpm kernel") {
    import graft.functions.FixedPoint
    val model = LanguageModel.knBigramModel(docs, "text", 750000L)
    val sc = LanguageModel.knSurprise(docs, model, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc1: (a b)×2 @812500 + (b a)@270833 + (b c)@270833
    val natsAb = FixedPoint.lnPpmLong(1000000L, 812500L)
    val natsB = FixedPoint.lnPpmLong(1000000L, 270833L)
    assert(sc(1L) === ((4L, 2L * 812500L + 2L * 270833L,
      2L * natsAb + 2L * natsB)))
    // doc2: (a b)@812500 + (b x)@270833
    assert(sc(2L) === ((2L, 812500L + 270833L, natsAb + natsB)))
  }

  // Modified KN on the same fixture: count-of-counts n1=3 (ba/bc/bx),
  // n2=0, n3=1 (ab), n4=0 → Y = 1e6, D1 = 1e6 (full singleton
  // discount), D2 clamps to 0, D3+ = 3e6. Every observed bigram's
  // explicit term discounts to 0 and γ redistributes the whole mass
  // through pcont = 250000 — so all four bigrams score exactly
  // γ·pcont = 250000 ppm, and head b's mass (3 observed + 1
  // unobserved × 250000) reconstructs 10^6 EXACTLY.
  test("knBigramModelModified: hand-computed estimated discounts") {
    val m = LanguageModel.knBigramModelModified(docs, "text")
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("kn_ppm")).toMap
    assert(m === Map("a b" -> 250000L, "b a" -> 250000L,
      "b c" -> 250000L, "b x" -> 250000L))
  }

  test("knBigramModelModified: knSurprise scores against it") {
    import graft.functions.FixedPoint
    val model = LanguageModel.knBigramModelModified(docs, "text")
    val sc = LanguageModel.knSurprise(docs, model, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val nats = FixedPoint.lnPpmLong(1000000L, 250000L)
    assert(sc(1L) === ((4L, 4L * 250000L, 4L * nats)))
    assert(sc(2L) === ((2L, 2L * 250000L, 2L * nats)))
  }

  test("knBigramModel: discount contract and sub-2-token docs") {
    intercept[IllegalArgumentException] {
      LanguageModel.knBigramModel(docs, "text", 1000000L)
    }
    val short = Seq((1L, "one"), (2L, "")).toDF("doc_id", "text")
    val model = LanguageModel.knBigramModel(docs, "text", 750000L)
    val sc = LanguageModel.knSurprise(short, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bigram-free docs survive with zero counts, never dropped
    assert(sc === Map(1L -> 0L, 2L -> 0L))
  }
}
