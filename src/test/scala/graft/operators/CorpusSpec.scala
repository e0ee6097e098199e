package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus-assembly operators: split stability/coverage and the
  * distributed-prefix-sum packing against a sequential reference scan.
  * (q79/q80 gate the same math against DuckDB; these specs pin the
  * properties the oracle can't phrase — growth-invariance, budget
  * bounds — on controlled fixtures.)
  */
class CorpusSpec extends SparkSpec {

  test("hashSplit: deterministic, total, and growth-invariant") {
    import spark.implicits._
    val w = Seq(("train", 8), ("val", 1), ("test", 1))
    val small = (0L until 200L).toDF("id")
    val a = Corpus.hashSplit(small, "id", "s1", w).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Corpus.hashSplit(small, "id", "s1", w).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b) // rerun-stable
    // adding documents never reassigns existing ones
    val grown = Corpus.hashSplit((0L until 400L).toDF("id"), "id", "s1", w)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.forall { case (k, v) => grown(k) == v })
    // every row lands in exactly one declared split; all splits non-empty
    assert(a.values.toSet === Set("train", "val", "test"))
    // a different salt reshuffles membership
    val resalted = Corpus.hashSplit(small, "id", "s2", w).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.exists { case (k, v) => resalted(k) != v })
  }

  test("hashSplit: proportions track the declared weights") {
    import spark.implicits._
    val w = Seq(("train", 8), ("val", 1), ("test", 1))
    val counts = Corpus.hashSplit((0L until 2000L).toDF("id"), "id", "s1", w)
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1400 && counts("train") < 1800)
    assert(counts("val") > 100 && counts("val") < 320)
    assert(counts("test") > 100 && counts("test") < 320)
  }

  test("mixtureSample: per-source rates, rerun-stable, monotone in rate") {
    import spark.implicits._
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}"))
      .toDF("id", "source")
    def sample(rates: Map[String, Double]) =
      Corpus.mixtureSample(docs, "id", "m1", "source", rates, 0.0)
        .collect().map(_.getLong(0)).toSet
    val a = sample(Map("src0" -> 1.0, "src1" -> 0.3))
    assert(a === sample(Map("src0" -> 1.0, "src1" -> 0.3))) // deterministic
    // src0 kept fully, src1 ~30%, src2 dropped by the default rate
    val bySrc = a.groupBy(id => id % 3).view.mapValues(_.size).toMap
    assert(bySrc(0L) === 1000)
    assert(bySrc.getOrElse(2L, 0) === 0)
    assert(bySrc(1L) > 200 && bySrc(1L) < 400)
    // raising a rate strictly grows the sample (no resampling churn)
    val b = sample(Map("src0" -> 1.0, "src1" -> 0.6))
    assert(a.subsetOf(b))
  }

  test("chunk: overlapping windows, short tail, empty doc drops out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 toks, chunk 4 overlap 1
      (2L, "a b"),                            // single short chunk
      (3L, "")                                // no chunks
    ).toDF("doc_id", "text")
    val got = Corpus.chunk(docs, "text", chunkTokens = 4, overlap = 1)
      .orderBy(col("doc_id"), col("chunk_ix"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // doc 1: starts 0,3,6,9 -> windows of 4 sharing 1 token
    assert(got.toSeq === Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 1L, "t9"),
      (2L, 0L, 2L, "a b")))
  }

  test("packShards: numeric-string ids work; non-numeric ids fail loudly") {
    import spark.implicits._
    // CSV-style string ids holding numbers must keep working
    val numericStrings = Seq(("0", 10L), ("1", 20L), ("2", 5L))
      .toDF("id", "n")
    val ok = Corpus.packShards(numericStrings, "id", "n", budget = 100L)
      .collect()
    assert(ok.length === 3)
    // a genuinely non-numeric id must raise, never return zero rows
    val bad = Seq(("doc-a", 10L), ("doc-b", 20L)).toDF("id", "n")
    val e = intercept[Exception] {
      Corpus.packShards(bad, "id", "n", budget = 100L).collect()
    }
    assert(e.getMessage.contains("non-numeric id") ||
      Option(e.getCause).exists(_.getMessage.contains("non-numeric id")))
  }

  test("packShards matches a sequential scan and respects the budget") {
    import spark.implicits._
    // sparse, unordered-by-partition ids; token counts incl. 0 and
    // budget-straddling values
    val docs = Seq(
      (3L, 100L), (1L, 50L), (8L, 0L), (2L, 900L), (13L, 300L),
      (5L, 1200L), (21L, 700L), (34L, 64L), (55L, 2048L), (89L, 10L))
      .toDF("id", "n")
    val got = Corpus.packShards(docs, "id", "n", budget = 1000L,
        bucketSize = 4L)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    // sequential reference: running offset in id order
    var off = 0L
    val want = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map { case (id, n) =>
        val row = (id, n, off, off / 1000L); off += n; row
      }
    assert(got.toSeq === want.toSeq)
    // shard ids are non-decreasing in id order and start at 0
    assert(got.head._4 === 0L)
    assert(got.sliding(2).forall(p => p(0)._4 <= p(1)._4))
  }

  test("packShards bucket decomposition is invariant to bucketSize") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i * 3L, (i * 7L) % 41L))
      .toDF("id", "n")
    def run(bs: Long) = Corpus.packShards(docs, "id", "n",
        budget = 100L, bucketSize = bs)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(run(1L) === run(7L))
    assert(run(7L) === run(1L << 16))
  }

  test("temperatureMixture flattens skewed sources; alpha=1 keeps all") {
    import spark.implicits._
    val docs = (0L until 1000L).map { i =>
      (i, if (i % 20 < 14) "big" else if (i % 20 < 18) "mid" else "small")
    }.toDF("doc_id", "source") // 700 / 200 / 100
    val kept = Corpus.temperatureMixture(docs, "doc_id", "t1", "source",
        alpha = 0.5)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest source (100 rows) keeps everything
    assert(kept("small") === 100L)
    // big (700): rate sqrt(100/700) ≈ 0.378; mid (200): ≈ 0.707 —
    // md5 buckets land near the expectation
    assert(kept("big") > 200L && kept("big") < 330L, s"big=${kept("big")}")
    assert(kept("mid") > 110L && kept("mid") < 180L, s"mid=${kept("mid")}")
    // alpha = 1: natural distribution untouched
    assert(Corpus.temperatureMixture(docs, "doc_id", "t1", "source",
      alpha = 1.0).count() === 1000L)
    // deterministic: same salt, same survivors
    val a = Corpus.temperatureMixture(docs, "doc_id", "t1", "source", 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Corpus.temperatureMixture(docs, "doc_id", "t1", "source", 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }

  test("exactQuantiles: nearest-rank values, ties, single-row group") {
    import spark.implicits._
    val rows = (1L to 10L).map(v => ("g1", v * 10L, v)) ++
      Seq(("g2", 7L, 100L)) ++                      // single row: every q = 7
      (1L to 4L).map(i => ("g3", 5L, 200L + i))     // all-equal values
    val df = rows.toDF("src", "v", "id")
    val got = Corpus.exactQuantiles(df, "src", "v", "id",
        Seq(0.5, 0.9, 0.99))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // g1: n=10 → ranks ceil(5)=5, ceil(9)=9, ceil(9.9)=10
    assert(got("g1") === ((10L, 50L, 90L, 100L)))
    assert(got("g2") === ((1L, 7L, 7L, 7L)))
    assert(got("g3") === ((4L, 5L, 5L, 5L)))
  }

  test("histogramQuantiles reports the first bin's upper edge at each p") {
    import spark.implicits._
    // width 10: values 1..9 in bin 0 (edge 10), 10 in bin 1 (edge 20)
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("k", "v")
    val got = Corpus.histogramQuantiles(df, "k", "v", 10.0,
      Seq(0.5, 0.99)).collect()
    // bin 0 holds 9 of 10 -> cum 9 >= ceil(.5*10)=5 -> q_50_est = 10
    // ceil(.99*10)=10 needs cum 10 -> bin 1 -> q_99_est = 20
    assert((got.head.getLong(1), got.head.getDouble(2),
      got.head.getDouble(3)) === (10L, 10.0, 20.0))
  }

  test("histogramQuantiles error vs exactQuantiles is within one binWidth") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("a", i.toDouble * 3.0, i.toLong))
      .toDF("k", "v", "id")
    val exact = Corpus.exactQuantiles(df, "k", "v", "id", Seq(0.5, 0.9))
      .collect().head
    val est = Corpus.histogramQuantiles(df, "k", "v", 50.0, Seq(0.5, 0.9))
      .collect().head
    for (i <- 2 to 3) {
      // quantile on a bin LOWER edge makes the diff exactly binWidth
      val e = est.getDouble(i) - exact.getDouble(i)
      assert(e > 0 && e <= 50.0,
        s"estimate must be within one bin above exact, got diff $e")
    }
  }

  test("quantilesBisect matches the nearest-rank window definition") {
    import spark.implicits._
    // skewed + tied values, negatives included
    val vals = Seq(-5L, -5L, 0L, 3L, 3L, 3L, 7L, 100L, 1000L, 1000L)
    val df = vals.toDF("v")
    val r = Corpus.quantilesBisect(df, "v", Seq(0.5, 0.9, 0.99, 1.0))
      .collect()(0)
    // n=10 → ranks 5, 9, 10, 10; sorted: -5 -5 0 3 3 3 7 100 1000 1000
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 3L)     // q_50: rank 5
    assert(r.getLong(2) === 1000L)  // q_90: rank 9
    assert(r.getLong(3) === 1000L)  // q_99: rank 10
    assert(r.getLong(4) === 1000L)  // q_100
  }

  test("quantilesBisect: constant column, single row, empty input") {
    import spark.implicits._
    val const = Corpus.quantilesBisect(
      Seq(42L, 42L, 42L).toDF("v"), "v", Seq(0.5, 0.99)).collect()(0)
    assert(const.getLong(0) === 3L && const.getLong(1) === 42L &&
      const.getLong(2) === 42L)
    val one = Corpus.quantilesBisect(
      Seq(-9L).toDF("v"), "v", Seq(0.5)).collect()(0)
    assert(one.getLong(0) === 1L && one.getLong(1) === -9L)
    val empty = Corpus.quantilesBisect(
      Seq.empty[Long].toDF("v"), "v", Seq(0.5, 0.9)).collect()(0)
    assert(empty.getLong(0) === 0L && empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("quantilesBisect matches sorted-order statistics on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 5) {
      val n = 1 + rnd.nextInt(200)
      val vals = Seq.fill(n)(rnd.nextLong() % 1000L) // heavy ties
      val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
      val got = Corpus.quantilesBisect(vals.toDF("v"), "v", ps).collect()(0)
      val sorted = vals.sorted
      assert(got.getLong(0) === n.toLong)
      ps.zipWithIndex.foreach { case (p, i) =>
        val rank = math.ceil(p * n).toInt
        assert(got.getLong(i + 1) === sorted(rank - 1),
          s"trial $trial p=$p n=$n")
      }
    }
  }

  test("quantilesBisect survives 64-bit extreme values") {
    import spark.implicits._
    // Long.MinValue/MaxValue would wrap a naive (lo+hi)/2 midpoint or
    // a vMin-1 sentinel; the BigInt midpoint and inclusive [lo,hi]
    // bounds must stay exact
    val vals = Seq(Long.MinValue, -7L, 0L, 9L, Long.MaxValue)
    val r = Corpus.quantilesBisect(vals.toDF("v"), "v",
      Seq(0.2, 0.5, 0.8, 1.0)).collect()(0)
    // ranks over n=5: 1, 3, 4, 5
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === Long.MinValue)
    assert(r.getLong(2) === 0L)
    assert(r.getLong(3) === 9L)
    assert(r.getLong(4) === Long.MaxValue)
  }

  test("negativeSample: deterministic, in-range, never the anchor") {
    import spark.implicits._
    val ids = (0L until 20L).toDF("id")
    val s1 = Corpus.negativeSample(ids, "id", k = 3, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.length === 60)
    assert(s1.forall { case (a, _, n) => n >= 0 && n < 20 && n != a })
    val s2 = Corpus.negativeSample(ids, "id", k = 3, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.sorted.toSeq === s2.sorted.toSeq) // pure function of (id,j,salt)
    val s3 = Corpus.negativeSample(ids, "id", k = 3, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.sorted.toSeq !== s3.sorted.toSeq) // salt actually matters
  }

  test("stratifiedSample: exact per-group counts, stable, salt-driven") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 1L to 10L)
      yield (g, g + i)).toDF("grp", "id")
    val one = Seq(("c", "solo")).toDF("grp", "id")
    val s1 = Corpus.stratifiedSample(df.union(one), "grp", "id", "s", 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(s1.count(_._1 == "a") === 4)
    assert(s1.count(_._1 == "b") === 4)
    assert(s1.count(_._1 == "c") === 1) // smaller group keeps all
    assert(s1.forall(_._3 <= 4))
    val s2 = Corpus.stratifiedSample(df.union(one), "grp", "id", "s", 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(s1.sortBy(t => (t._1, t._3)).toSeq ===
      s2.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("importanceWeights: target-only tokens score 1e6, absent-from-target 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta", true),   // target
      (2L, "beta gamma", false),
      (3L, "", false)                    // zero tokens
    ).toDF("id", "text", "tgt")
    val got = Corpus.importanceWeights(docs, "id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // weights: alpha 2/2=1e6; beta 1/2=500000; gamma 0/1=0
    assert(got(1L) === ((3L, 1000000L + 1000000L + 500000L)))
    assert(got(2L) === ((2L, 500000L)))
    assert(got(3L) === ((0L, 0L))) // empty doc present, score 0
  }

  test("weightedPrioritySample: deterministic, weight-monotone, excludes w<=0") {
    import spark.implicits._
    val df = Seq(
      (1L, "g", 10L), (2L, "g", 10L), (3L, "g", 10L),
      (4L, "g", 0L),  (5L, "g", -3L) // never drawn
    ).toDF("id", "grp", "w")
    val pick = Corpus.weightedPrioritySample(df, "id", "w", "grp", 5, "s1")
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    assert(pick.map(_._1).toSet === Set(1L, 2L, 3L)) // w<=0 excluded
    assert(pick.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L)) // dense ranks
    // rerun identical (pure function of id:salt)
    val again = Corpus.weightedPrioritySample(df, "id", "w", "grp", 5, "s1")
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    assert(pick.toSeq === again.toSeq)
    // scaling one weight up can only improve (shrink) its priority
    val boosted = Seq((1L, "g", 1000000L)).toDF("id", "grp", "w")
    val p1 = Corpus.weightedPrioritySample(df, "id", "w", "grp", 5, "s1")
      .filter(col("id") === 1L).collect().head.getLong(3)
    val p2 = Corpus.weightedPrioritySample(boosted, "id", "w", "grp", 5, "s1")
      .collect().head.getLong(3)
    assert(p2 <= p1)
  }

  test("weightedSampleAes: exact A-ES key, deterministic, integral contract") {
    import spark.implicits._
    val df = Seq(
      (1L, "g", 10L), (2L, "g", 10L), (3L, "g", 10L),
      (4L, "g", 0L) // never drawn
    ).toDF("id", "grp", "w")
    val pick = Corpus.weightedSampleAes(df, "id", "w", "grp", 4, "sA")
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(4)))
    assert(pick.map(_._1).toSet === Set(1L, 2L, 3L))
    // priorities match the portable-fold recompute of
    // lnPpm(2^32, h32+1)·1e9 div w — the native kernel and the
    // Column pipeline agree on the exact E-S key
    val expect = df.filter(col("w") > 0)
      .withColumn("__h32", graft.expressions.Md5Hash60.hash60Native(
        concat_ws(":", col("id"), lit("sA"))) % 4294967296L)
      .withColumn("pe", graft.functions.FixedPoint.idiv(
        graft.functions.FixedPoint.lnPpmPortable(
          lit(4294967296L), col("__h32") + 1L) * 1000000000L, col("w")))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pe")).toMap
    pick.foreach { case (id, _, pri) => assert(pri === expect(id)) }
    // rerun identical (pure function of id:salt)
    val again = Corpus.weightedSampleAes(df, "id", "w", "grp", 4, "sA")
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(4)))
    assert(pick.toSeq === again.toSeq)
    // a dominant weight shrinks the priority toward 0: always drawn
    val big = Seq((7L, "g", 1000000000L), (8L, "g", 1L)).toDF("id", "grp", "w")
    val top = Corpus.weightedSampleAes(big, "id", "w", "grp", 1, "sA")
      .collect().head
    assert(top.getLong(2) === 7L)
    // fractional weights fail fast — silent div truncation forbidden
    val frac = Seq((1L, "g", 2.5)).toDF("id", "grp", "w")
    intercept[IllegalArgumentException] {
      Corpus.weightedSampleAes(frac, "id", "w", "grp", 1, "sA")
    }
  }

  test("quotaAllocation: exact total, proportionality, remainder ranking") {
    import spark.implicits._
    // counts 5 / 3 / 2 over total 7: bases 3/2/1 (floor of 3.5/2.1/1.4),
    // Σbase = 6, one spare slot → largest remainder .5 (group a) gets it
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("g")
    val got = Corpus.quotaAllocation(df, "g", 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(got.values.sum === 7L)

    // remainder tie (2/2 over total 3): equal remainders → smaller key
    val tie = (Seq.fill(2)("x") ++ Seq.fill(2)("y")).toDF("g")
    val t = Corpus.quotaAllocation(tie, "g", 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(t === Map("x" -> 2L, "y" -> 1L))
    // degenerate totals
    assert(Corpus.quotaAllocation(tie, "g", 0L)
      .collect().map(_.getLong(2)).sum === 0L)
  }

  test("paddingWaste: ceil-to-seqLen accounting, empty docs cost nothing") {
    import spark.implicits._
    val docs = Seq(
      ("a", "t1 t2 t3"),            // 3 tokens → 4 padded (seqLen 4)
      ("a", "t1 t2 t3 t4"),         // 4 → 4, zero waste
      ("a", "t1 t2 t3 t4 t5"),      // 5 → 8
      ("a", "")).toDF("src", "text") // 0 → 0 sequences
    val r = Corpus.paddingWaste(docs, "text", "src", seqLen = 4)
      .collect().head
    // totals: docs 4, tokens 12, padded 16, waste (4/16) = 250000 ppm
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((4L, 12L, 16L, 250000L)))
  }

  test("stratifiedKFold: exact ±1 balance per stratum, deterministic") {
    import spark.implicits._
    // 23 rows in stratum a (5 folds → sizes 5,5,5,4,4), 7 in b (2,2,1,1,1)
    val df = ((1L to 23L).map(i => (i, "a")) ++
      (100L to 106L).map(i => (i, "b"))).toDF("id", "src")
    val got = Corpus.stratifiedKFold(df, "id", "src", k = 5, salt = "s")
    val sizes = got.groupBy("src", "fold").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    (0 until 5).foreach { f =>
      assert(Seq(4L, 5L).contains(sizes(("a", f))))
      assert(Seq(1L, 2L).contains(sizes(("b", f))))
    }
    assert((0 until 5).map(f => sizes(("a", f))).sum === 23L)
    // rerun assigns identically
    val again = Corpus.stratifiedKFold(df, "id", "src", k = 5, salt = "s")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val first = got.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again === first)
    // a different salt deals differently (not a constant function)
    val other = Corpus.stratifiedKFold(df, "id", "src", k = 5, salt = "t")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(other !== first)
  }

  test("packBlocks: offsets, block spans, boundary flags, empty docs") {
    import spark.implicits._
    // blockSize 4; docs (id, tokens): 1→3, 2→0 (empty), 3→6, 4→1
    // stream: [d1 d1 d1 EOS | d3 d3 d3 d3 | d3 d3 EOS EOS-d2? ...]
    // offsets (len+1 cumsum): d1@0, d2@4, d3@5, d4@12
    val docs = Seq(
      (1L, "a b c"), (2L, ""), (3L, "a b c d e f"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = Corpus.packBlocks(docs, "doc_id", "text", blockSize = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (1L, 3L, 0L, 0L, 0L, false),   // tokens [0,2] → block 0
      (2L, 0L, 4L, 1L, 1L, false),   // empty: separator slot only
      (3L, 6L, 5L, 1L, 2L, true),    // tokens [5,10] → blocks 1-2
      (4L, 1L, 12L, 3L, 3L, false))) // token [12] → block 3
  }

  test("quantile normalization maps source ranks onto global values") {
    import spark.implicits._
    // source A scores 10,20 (n=2); source B scores 1,2,3,4 (n=4);
    // global sorted: 1,2,3,4,10,20 (N=6).
    // A rank1 → ceil(1·6/2)=3 → 3;  A rank2 → 6 → 20
    // B rank1 → ceil(1·6/4)=2 → 2;  rank2 → 3 → 3; rank3 → ceil(18/4)=5
    // → 10; rank4 → 6 → 20
    val df = Seq(
      (1L, "A", 10L), (2L, "A", 20L),
      (3L, "B", 1L), (4L, "B", 2L), (5L, "B", 3L), (6L, "B", 4L))
      .toDF("id", "src", "score")
    val got = QuantileNorm.normalize(df, "id", "src", "score")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(6)))
    assert(got.toSeq === Seq((1L, 3L), (2L, 20L), (3L, 2L), (4L, 3L),
      (5L, 10L), (6L, 20L)))
  }

  test("quantile normalization: identical sources are a fixed point") {
    import spark.implicits._
    // one source ⇒ target_rank = src_rank ⇒ normalized = own value
    val df = (1L to 9L).map(i => (i, "only", i * 7)).toDF("id", "src", "v")
    val got = QuantileNorm.normalize(df, "id", "src", "v")
      .collect().map(r => (r.getLong(2), r.getLong(6)))
    assert(got.forall { case (v, norm) => v == norm })
  }

  test("groupKFold: group members share a fold; fold is stable under append") {
    import spark.implicits._
    val df = Seq((1L, "ga"), (2L, "ga"), (3L, "gb"), (4L, "gc"),
      (5L, "gb")).toDF("id", "grp")
    val got = Corpus.groupKFold(df, "grp", 4)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // every member of a group saw the same fold (Map would have lost
    // a key on disagreement only if values differed -- check directly)
    val byGroup = Corpus.groupKFold(df, "grp", 4)
      .groupBy("grp").agg(countDistinct(col("fold")).as("nf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup.values.forall(_ == 1L))
    assert(got.values.forall(f => f >= 0 && f < 4))
    // appending a new member of an old group lands in that group's fold
    val appended = Corpus.groupKFold(Seq((99L, "ga")).toDF("id", "grp"), "grp", 4)
      .head().getLong(2)
    assert(appended === got("ga"))
    intercept[IllegalArgumentException] {
      Corpus.groupKFold(df, "grp", 1)
    }
  }

  test("dedupSentences: keep-first across docs, keeper keeps repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta. Shared line. Gamma!"),
      (2L, "Shared line. Own text here"),       // loses the dup to doc 1
      (3L, "Twice over. Twice over. Solo bit?") // in-doc repeat: doc 3
    ).toDF("doc_id", "text")                    // owns it, keeps BOTH
    val got = Corpus.dedupSentences(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((3L, 0L, "Alpha beta. Shared line. Gamma!")))
    assert(got(2L) === ((2L, 1L, "Own text here")))
    assert(got(3L) === ((3L, 0L, "Twice over. Twice over. Solo bit?")))

    // all sentences dropped → empty content, not null; empty / null /
    // whitespace-only docs vanish (no sentences to count)
    val edge = Seq(
      (10L, "Only line."),
      (11L, "Only line."),
      (12L, ""), (13L, null.asInstanceOf[String]), (14L, "   ")
    ).toDF("doc_id", "text")
    val e = Corpus.dedupSentences(edge, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(e(10L) === ((1L, 0L, "Only line.")))
    assert(e(11L) === ((1L, 1L, "")))
    assert(!e.contains(12L) && !e.contains(13L) && !e.contains(14L))
  }

  test("globalRowNumber: bucketed ranks equal the naive global order") {
    import spark.implicits._
    // sparse, shuffled keys incl. empty buckets and a bucket boundary
    val keys = Seq(7L, 0L, 15L, 16L, 3L, 100L, 31L, 32L, 99L)
    val df = keys.toDF("k")
    val got = Corpus.globalRowNumber(df, "k", bucketWidth = 16L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = keys.sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    assert(got === want)
    assert(Corpus.globalRowNumber(df.filter(col("k") < 0), "k").count() === 0L)
  }

  test("prefixSum: bucketed decomposition equals the running sum") {
    import spark.implicits._
    val rows = Seq((7L, 3L), (0L, 10L), (15L, 1L), (16L, 5L), (32L, 2L),
      (100L, 4L), (31L, 7L))
    val got = Corpus.prefixSum(rows.toDF("k", "v"), "k", "v",
        bucketWidth = 16L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var cum = 0L
    val want = rows.sortBy(_._1).map { case (k, v) =>
      cum += v; k -> cum
    }.toMap
    assert(got === want)
    assert(Corpus.prefixSum(rows.toDF("k", "v").filter(col("k") < 0),
      "k", "v").count() === 0L)
  }

  test("vocabGrowth: first-occurrence accounting, empty docs, ties") {
    import spark.implicits._
    // 4 docs, 2 steps: step 0 = docs {0,1}, step 1 = docs {2,3}
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"), (2L, ""), (3L, "c d D")
    ).toDF("doc_id", "text")
    val got = Corpus.vocabGrowth(docs, "doc_id", "text", steps = 2)
      .orderBy(col("step"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // step 0 introduces a,b,c; step 1 only d (lowercased D merges)
    assert(got.toSeq === Seq((0L, 2L, 3L, 3L), (1L, 2L, 1L, 4L)))
    // empty corpus: empty step frame, not a divide-by-zero plan
    assert(Corpus.vocabGrowth(docs.filter(col("doc_id") < 0),
      "doc_id", "text", steps = 2).count() === 0L)
  }

  test("collocationLift: adjacency, minCount prune, lift algebra") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y"),   // bigrams: (x,y) (y,x) (x,y)
      (2L, "x y z"),     // (x,y) (y,z)
      (3L, "solo"), (4L, "")
    ).toDF("doc_id", "text")
    val got = Corpus.collocationLift(docs, "doc_id", "text",
        minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // N=8 tokens; c(x)=3 c(y)=3; (x,y): cab=3 → 3·8·1e6 div 9
    assert(got.keySet === Set(("x", "y")))
    assert(got(("x", "y")) === ((3L, 3L, 3L, 2666666L)))
    // empty corpus: empty result, no NPE on the null token total
    assert(Corpus.collocationLift(docs.filter(col("doc_id") < 0),
      "doc_id", "text", minCount = 1L).count() === 0L)
  }

  test("spanCorruption: sentinels pair, masks count, input+targets reassemble") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("id", "t")
    val out = Corpus.spanCorruption(docs, "id", "t",
      spanLen = 3, everyK = 2).collect().head
    val nTok = out.getAs[Long]("n_tokens")
    val nSpans = out.getAs[Long]("n_spans")
    val nMasked = out.getAs[Long]("n_masked")
    val in = out.getAs[String]("input_text")
    val tgt = out.getAs[String]("targets_text")
    assert(nTok === 16L)
    // every span is 3 tokens unless truncated at the doc end
    assert(nMasked >= nSpans * 1 && nMasked <= nSpans * 3)
    // sentinels appear once in input, once in targets, in order
    (0L until nSpans).foreach { k =>
      assert(in.contains(s"<extra_id_$k>") && tgt.contains(s"<extra_id_$k>"))
    }
    // reassembly invariant: replacing each input sentinel with its
    // target span reproduces the original token stream
    var rebuilt = in
    val spans = tgt.split("<extra_id_").drop(1).map { s =>
      val idx = s.takeWhile(_ != '>')
      idx.toLong -> s.dropWhile(_ != '>').drop(1).trim
    }.toMap
    spans.foreach { case (k, body) =>
      rebuilt = rebuilt.replace(s"<extra_id_$k>", body)
    }
    assert(rebuilt.replaceAll("\\s+", " ").trim ===
      "a b c d e f g h i j k l m n o p")
    // masked_ppm consistent
    assert(out.getAs[Long]("masked_ppm") === nMasked * 1000000L / nTok)
  }

  test("fimTransform: PSM segments partition the token stream") {
    import spark.implicits._
    val docs = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7")).toDF("id", "t")
    val out = Corpus.fimTransform(docs, "id", "t").collect().head
    val (n, c1, c2) = (out.getAs[Long]("n_tokens"),
      out.getAs[Long]("c1"), out.getAs[Long]("c2"))
    assert(n === 8L && c1 >= 0L && c1 <= c2 && c2 <= n)
    val psm = out.getAs[String]("psm_text")
    val pre = psm.substring(psm.indexOf("<PRE> ") + 6,
      psm.indexOf(" <SUF> "))
    val suf = psm.substring(psm.indexOf(" <SUF> ") + 7,
      psm.indexOf(" <MID> "))
    val mid = psm.substring(psm.indexOf(" <MID> ") + 7)
    // prefix ++ middle ++ suffix = original, with the hash cuts
    assert((pre + " " + mid + " " + suf).replaceAll("\\s+", " ").trim
      === "t0 t1 t2 t3 t4 t5 t6 t7")
    assert(pre.split("\\s+").count(_.nonEmpty) === c1)
    assert(mid.split("\\s+").count(_.nonEmpty) === c2 - c1)
  }

  test("paretoFrontier: strict dominance, same-x ties, equal pairs") {
    import spark.implicits._
    val rows = Seq(
      // equal pairs: mutually non-dominating, BOTH kept
      ("g", 10L, 5L, "a"), ("g", 10L, 5L, "b"),
      // same x, smaller y: dominated within its own x column
      ("g", 10L, 4L, "f"),
      // equal y at strictly smaller x: dominated (not strictly above)
      ("g", 9L, 5L, "c"),
      // strictly above everything to its right: kept
      ("g", 8L, 7L, "d"),
      // below the x=8 frontier point: dominated
      ("g", 7L, 6L, "e"),
      // second group is independent
      ("h", 1L, 1L, "z"))
      .toDF("grp", "x", "y", "id")
    val kept = Corpus.paretoFrontier(rows, "grp", "x", "y", "id")
      .select("id").as[String].collect().toSet
    assert(kept === Set("a", "b", "d", "z"))
  }

  test("packSentenceChunks: greedy boundaries, oversized own chunk") {
    import spark.implicits._
    // doc 1: sentences of 3, 2, 4, 1 tokens at budget 5 →
    // chunk 0 = [3, 2] (exact fit), chunk 1 = [4, 1]
    // doc 2: 7-token sentence (over budget) stands alone, then [2, 2]
    // doc 3: empty text → absent
    val docs = Seq(
      (1L, "a b c. d e. f g h i. j."),
      (2L, "one two three four five six seven. a b. c d."),
      (3L, "")).toDF("doc_id", "t")
    val got = Corpus.packSentenceChunks(docs, "doc_id", "t", 5)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got === Seq(
      (1L, 0L, 2L, 5L, "a b c. d e."),
      (1L, 1L, 2L, 5L, "f g h i. j."),
      (2L, 0L, 1L, 7L, "one two three four five six seven."),
      (2L, 1L, 2L, 4L, "a b. c d.")))
  }

  test("packSentenceChunks: no sentence is ever split across chunks") {
    import spark.implicits._
    val docs = Seq((1L, Seq.tabulate(30)(i => s"w$i t$i u$i.")
      .mkString(" "))).toDF("doc_id", "t")
    val chunks = Corpus.packSentenceChunks(docs, "doc_id", "t", 7)
    // every chunk's text is a concatenation of whole sentences:
    // re-segmenting the chunks must reproduce the original sentences
    val resplit = graft.operators.TextAnalysis
      .sentences(chunks, "doc_id", "chunk_text")
      .select("sentence").as[String].collect().sorted.toSeq
    val orig = graft.operators.TextAnalysis
      .sentences(docs, "doc_id", "t")
      .select("sentence").as[String].collect().sorted.toSeq
    assert(resplit === orig)
    // budget 7 with 3-token sentences → 2 sentences (6 tokens) per
    // chunk, 15 chunks
    assert(chunks.count() === 15L)
  }

  test("packSentenceChunks invariants over a seeded random batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // token conservation (every sentence token lands in exactly one
    // chunk) and budget discipline (a chunk exceeds the budget ONLY
    // when it is a single unsplittable sentence) over 40 seeded docs
    val rnd = new scala.util.Random(11L)
    def doc() = Seq.fill(2 + rnd.nextInt(10))(
      Seq.fill(1 + rnd.nextInt(9))("w" + rnd.nextInt(50)).mkString(" ")
        + ".").mkString(" ")
    val docs = (1L to 40L).map(i => (i, doc())).toDF("doc_id", "t")
    val chunks = Corpus.packSentenceChunks(docs, "doc_id", "t", 6)
      .localCheckpoint(true)
    val perDocChunks = chunks.groupBy("doc_id")
      .agg(sum("chunk_tokens").as("packed")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDocSents = graft.operators.TextAnalysis
      .sentences(docs, "doc_id", "t")
      .groupBy("doc_id")
      .agg(sum(graft.operators.TextAnalysis.nTokens(col("sentence"))
        .cast("long")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDocChunks === perDocSents)
    val over = chunks.filter(col("chunk_tokens") > 6)
    assert(over.filter(col("n_sentences") > 1).count() === 0L)
  }
}
