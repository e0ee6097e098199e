package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-6 batch: ROUGE overlap, Benford audit, hot-key report,
  * KMV join-size estimation.
  */
class EvalStatsSpec extends SparkSpec {

  import spark.implicits._

  test("rougeOverlap: identical docs score 10^6 ppm on both orders") {
    val docs = Seq((1L, "a b c a"), (2L, "a b c a")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Eval.rougeOverlap(pairs, docs, "id", "text").collect().head
    val m = r.getValuesMap[Long](Seq("p1_ppm", "r1_ppm", "p2_ppm", "r2_ppm"))
    assert(m.values.toSet === Set(1000000L))
  }

  test("rougeOverlap: clipping caps repeated grams at the reference count") {
    // cand = "a a a b", ref = "a b b": clip1 = min(3,1) + min(1,2) = 2
    val docs = Seq((1L, "a a a b"), (2L, "a b b")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Eval.rougeOverlap(pairs, docs, "id", "text").collect().head
    assert(r.getAs[Long]("clip1") === 2L)
    assert(r.getAs[Long]("p1_ppm") === 500000L)  // 2/4
    assert(r.getAs[Long]("r1_ppm") === 666666L)  // 2/3
    // bigrams: cand {a a:2, a b:1}, ref {a b:1, b b:1} → clip2 = 1
    assert(r.getAs[Long]("clip2") === 1L)
  }

  test("rougeOverlap: empty-text docs keep their pair with all-zero scores") {
    // id 2 tokenizes to ZERO unigrams — pre-fix the inner unigram
    // size joins dropped the pair entirely; it must survive with 0s
    val docs = Seq((1L, "a b"), (2L, "   ")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 1L)).toDF("id_a", "id_b")
    val got = Eval.rougeOverlap(pairs, docs, "id", "text")
      .orderBy("id_a").collect()
    assert(got.length === 2)
    got.foreach { r =>
      Seq("clip1", "clip2", "p1_ppm", "r1_ppm", "p2_ppm", "r2_ppm")
        .foreach(c => assert(r.getAs[Long](c) === 0L, c))
    }
  }

  test("markovStationaryPpm: empty transition frame fails fast") {
    val tr = Seq.empty[(String, String, Long)].toDF("s", "d", "c")
    val e = intercept[IllegalArgumentException] {
      Graph.markovStationaryPpm(tr, "s", "d", "c", iters = 1).collect()
    }
    assert(e.getMessage.contains("empty"))
  }

  test("rougeOverlap: single-token and disjoint docs are zero, not null") {
    val docs = Seq((1L, "x"), (2L, "y")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Eval.rougeOverlap(pairs, docs, "id", "text").collect().head
    assert(r.getAs[Long]("clip1") === 0L && r.getAs[Long]("n_a2") === 0L
      && r.getAs[Long]("p2_ppm") === 0L)
  }

  test("benfordAudit: hand distribution, absent digits still owe deviation") {
    // 5 rows: 1x '1xx', 4x '9x' → digits {1:1, 9:4}; 2..8 absent
    val df = Seq(150.0, 90.0, 91.5, 95.0, 99.9).toDF("v")
    val got = Analytics.benfordAudit(df, col("v"))
      .orderBy("digit").collect()
    assert(got.length === 9)
    val d1 = got.head
    assert(d1.getAs[Long]("n") === 1L &&
      d1.getAs[Long]("obs_ppm") === 200000L &&
      d1.getAs[Long]("exp_ppm") === 301029L)
    val d9 = got.last
    assert(d9.getAs[Long]("n") === 4L &&
      d9.getAs[Long]("obs_ppm") === 800000L)
    val d5 = got(4)
    assert(d5.getAs[Long]("n") === 0L &&
      d5.getAs[Long]("dev_ppm") === 79181L)
    // MAD identical on every row
    assert(got.map(_.getAs[Long]("mad_ppm")).toSet.size === 1)
  }

  test("benfordAudit: sub-1 amounts are excluded") {
    val df = Seq(0.5, 0.01, 42.0).toDF("v")
    val got = Analytics.benfordAudit(df, col("v"))
      .filter(col("n") > 0).collect()
    assert(got.length === 1 && got.head.getAs[Int]("digit") === 4)
  }

  test("hotKeys: ranks, shares, cumulative share") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    val got = Relational.hotKeys(df, "k", topN = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "a", 6L, 600000L, 600000L),
      (2L, "b", 3L, 300000L, 900000L)))
  }

  test("topNOther: tail folds into one 'other' row with exact shares") {
    val df = (Seq.fill(5)(("g", "a")) ++ Seq.fill(3)(("g", "b")) ++
      Seq(("g", "c"), ("g", "d"))).toDF("grp", "cat")
    val got = Analytics.topNOther(df, "grp", "cat", n = 2)
      .orderBy(col("is_other"), col("label"))
      .select("label", "n_rows", "n_cats", "share_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 5L, 1L, 500000L),
      ("b", 3L, 1L, 300000L),
      ("other", 2L, 2L, 200000L)))
  }

  test("topNOther: no tail → no 'other' row") {
    val df = Seq(("g", "a"), ("g", "b")).toDF("grp", "cat")
    val got = Analytics.topNOther(df, "grp", "cat", n = 5)
    assert(got.filter(col("is_other")).count() === 0L)
  }

  test("markovStationaryPpm: absorbing-ish chain drains mass to the sink") {
    // a→b always, b→b always: stationary mass concentrates on b
    val tr = Seq(("a", "b", 10L), ("b", "b", 90L)).toDF("s", "d", "c")
    val got = Graph.markovStationaryPpm(tr, "s", "d", "c", iters = 3)
      .orderBy("state").as[(String, Long)].collect().toSeq
    // v0 = (500000, 500000); round1: a gets 0, b gets 500000+500000
    assert(got === Seq(("a", 0L), ("b", 1000000L)))
  }

  test("markovStationaryPpm: uniform 2-cycle stays uniform") {
    val tr = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("s", "d", "c")
    val got = Graph.markovStationaryPpm(tr, "s", "d", "c", iters = 4)
      .orderBy("state").as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 500000L), ("b", 500000L)))
  }

  test("abBootstrapDiff: deterministic, bounds ordered, exact point diff") {
    val df = (1L to 200L).map(i => (i, i)).toDF("id", "v")
    val a = Analytics.abBootstrapDiff(df, "id", "v", 16, "s").collect().head
    val b = Analytics.abBootstrapDiff(df, "id", "v", 16, "s").collect().head
    assert(a === b)
    assert(a.getAs[Long]("n_a") + a.getAs[Long]("n_b") === 200L)
    assert(a.getAs[Long]("ci_lo_milli") <= a.getAs[Long]("ci_hi_milli"))
    val pt = a.getAs[Long]("mean_b_milli") - a.getAs[Long]("mean_a_milli")
    assert(a.getAs[Long]("point_diff_milli") === pt)
  }

  test("joinSizeEstimate: exact below saturation") {
    // A keys {1,1,2,3}, B keys {2,2,3,4}: distinct a=3, b=3,
    // union=4, common=2; est = (2/4·4)·(4/3·4/3) = 32/9 ≈ 3.555…;
    // true = 2·1 (key2) + 1·1 (key3) = 3
    val a = Seq("1", "1", "2", "3").toDF("k")
    val b = Seq("2", "2", "3", "4").toDF("k")
    val r = Sketch.joinSizeEstimate(a, col("k"), b, col("k"), k = 16)
      .collect().head
    assert(r.getAs[Long]("kk") === 4L)
    assert(r.getAs[Long]("matched") === 2L)
    assert(r.getAs[Double]("u_a") === 3.0)
    assert(r.getAs[Double]("u_b") === 3.0)
    assert(r.getAs[Double]("u_union") === 4.0)
    assert(math.abs(r.getAs[Double]("est_rows") - 32.0 / 9.0) < 1e-12)
  }

  private def pairOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r)
      .toMap

  test("bleuPairs: identical docs score log-BLEU 0 with bp 0") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = pairOf(Eval.bleuPairs(pairs, docs, "doc_id", "text"))((1L, 2L))
    assert(r.getAs[Long]("len_c") === 5L)
    assert(r.getAs[Long]("len_r") === 5L)
    assert((1 to 4).map(i => r.getAs[Long](s"clip$i")) === Seq(5L, 4L, 3L, 2L))
    assert(r.getAs[Long]("k_orders") === 4L)
    assert(r.getAs[Long]("bp_ppm") === 0L)
    assert(r.getAs[Long]("log_bleu_ppm") === 0L)
  }

  test("bleuPairs: brevity penalty and short-candidate order drop") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = pairOf(Eval.bleuPairs(pairs, docs, "doc_id", "text"))((1L, 2L))
    // precisions all exactly 1 over the populated orders (4-grams
    // drop: the candidate has none), so log-BLEU IS the penalty:
    // 1e6 − (4e6 div 3) = −333333
    assert(r.getAs[Long]("k_orders") === 3L)
    assert(r.getAs[Long]("bp_ppm") === -333333L)
    assert(r.getAs[Long]("log_bleu_ppm") === -333333L)
  }

  test("bleuPairs: zero overlap takes the +1 smoothing floor") {
    import graft.functions.FixedPoint
    val docs = Seq((1L, "x y"), (2L, "a b")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = pairOf(Eval.bleuPairs(pairs, docs, "doc_id", "text"))((1L, 2L))
    // order 1: ln(2/1); order 2: ln(1/1) = 0 (clip floored to 1 of 1);
    // orders 3-4 unpopulated; bp 0 (equal lengths)
    val expected = -(FixedPoint.lnPpmLong(2L, 1L) / 2L)
    assert(r.getAs[Long]("k_orders") === 2L)
    assert(r.getAs[Long]("log_bleu_ppm") === expected)
  }

  test("chrFPairs: identical text 10^6, disjoint 0, whitespace stripped") {
    val docs = Seq(
      (1L, "ab cd"), (2L, "abcd"),   // identical after strip
      (3L, "xyz"), (4L, "qqq"))      // disjoint
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val m = pairOf(Eval.chrFPairs(pairs, docs, "doc_id", "text"))
    // every populated order: m = c = r → 5m/(4m+m) = 1
    assert(m((1L, 2L)).getAs[Long]("chrf_ppm") === 1000000L)
    assert(m((1L, 2L)).getAs[Long]("k_orders") === 4L) // len 4 → n ≤ 4
    assert(m((3L, 4L)).getAs[Long]("chrf_ppm") === 0L)
  }

  test("bleu/chrF invariants over a seeded random batch") {
    // 24 deterministic pseudo-random pairs in ONE job per metric:
    // log-BLEU ≤ 0 always (a geometric mean of precisions ≤ 1 plus a
    // non-positive brevity term), chrF ∈ [0, 1e6], and the self-pair
    // of any non-empty text scores chrF exactly 1e6 / log-BLEU 0
    val rnd = new scala.util.Random(7L)
    val words = Seq("aa", "bb", "cc", "dd", "ee")
    def text() = Seq.fill(1 + rnd.nextInt(8))(
      words(rnd.nextInt(words.size))).mkString(" ")
    val docs = (1L to 48L).map(i => (i, text())).toDF("doc_id", "text")
    val pairs = (1L to 24L).map(i => (i, i + 24L)).toDF("id_a", "id_b")
    val selfPairs = (1L to 24L).map(i => (i, i)).toDF("id_a", "id_b")
    val bleu = Eval.bleuPairs(pairs, docs, "doc_id", "text").collect()
    assert(bleu.length === 24)
    assert(bleu.forall(_.getAs[Long]("log_bleu_ppm") <= 0L))
    val chrf = Eval.chrFPairs(pairs, docs, "doc_id", "text").collect()
    assert(chrf.forall { r =>
      val c = r.getAs[Long]("chrf_ppm"); c >= 0L && c <= 1000000L
    })
    val selfB = Eval.bleuPairs(selfPairs, docs, "doc_id", "text")
      .collect()
    assert(selfB.forall(_.getAs[Long]("log_bleu_ppm") === 0L))
    val selfC = Eval.chrFPairs(selfPairs, docs, "doc_id", "text")
      .collect()
    assert(selfC.forall(_.getAs[Long]("chrf_ppm") === 1000000L))
  }

  test("chrFPairs: empty-text pairs survive with zero score") {
    val docs = Seq((1L, ""), (2L, "ab")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val m = pairOf(Eval.chrFPairs(pairs, docs, "doc_id", "text"))
    // candidate empty: orders 1-2 have reference grams (den > 0, F 0),
    // so k = 2 and the score is 0 — present, never dropped
    assert(m((1L, 2L)).getAs[Long]("chrf_ppm") === 0L)
    assert(m((1L, 2L)).getAs[Long]("k_orders") === 2L)
  }
}
