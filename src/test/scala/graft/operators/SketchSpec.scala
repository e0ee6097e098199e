package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch properties on controlled streams (q93 gates the
  * exact counter table and estimates against DuckDB at corpus scale).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def stream = Seq.tabulate(300)(i => s"tok${i % 7}")
    .toDF("t") // tok0..tok6, counts 43±1

  private def trueCounts = stream.groupBy(col("t"))
    .agg(count(lit(1)).as("true_cnt"))

  test("w=1 degenerates to the total occurrence count") {
    val sk = Sketch.countMin(stream, col("t"), d = 3, w = 1)
    val est = Sketch.estimate(sk, trueCounts, col("t"), d = 3, w = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2))
    assert(est.forall(_._2 === 300L))
  }

  test("estimates upper-bound true counts; more rows never hurt") {
    def estimates(d: Int, w: Int) = {
      val sk = Sketch.countMin(stream, col("t"), d, w)
      Sketch.estimate(sk, trueCounts, col("t"), d, w)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    val e4 = estimates(4, 4) // 7 tokens in 4 buckets: collisions certain
    assert(e4.values.forall { case (truth, est) => est >= truth })
    // perms(1) is a prefix of perms(4) (same fixed seed), so the d=4
    // min ranges over a superset of hash rows: estimates only tighten
    val e1 = estimates(1, 4)
    assert(e4.forall { case (t, (_, est)) => est <= e1(t)._2 })
  }

  test("sketch is bounded by d*w regardless of stream size") {
    val sk = Sketch.countMin(stream, col("t"), d = 3, w = 4).collect()
    assert(sk.length <= 12)
    assert(sk.map(_.getLong(2)).sum === 3L * 300L) // each row counts all
  }

  test("heavyHitters: exact verification demotes collision inflation") {
    // 3 heavy tokens (100×) + 40 cold tokens (10×) into w=4 buckets:
    // bucket sums guarantee inflated cold candidates, which the exact
    // pass must mark unconfirmed — while true heavy hitters are always
    // candidates (CMS never undercounts) and always confirmed
    val data = (Seq.fill(100)("hot1") ++ Seq.fill(100)("hot2") ++
      Seq.fill(100)("hot3") ++
      (0 until 40).flatMap(i => Seq.fill(10)(s"cold$i"))).toDF("t")
    val hh = Sketch.heavyHitters(data, col("t"), d = 2, w = 4,
        threshold = 100L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(Seq("hot1", "hot2", "hot3").forall(t =>
      hh(t) == ((100L, true))))
    val colds = hh.filter(_._1.startsWith("cold"))
    assert(colds.nonEmpty) // 43 tokens in 4 buckets: inflation certain
    assert(colds.values.forall { case (cnt, conf) => cnt == 10L && !conf })
  }

  // ------------------------------------------------------ Bloom filter

  test("bloom: no false negatives; absent keys mostly read absent") {
    val nBits = 63 * 256
    val present = (0 until 500).map(i => s"key$i").toDF("k")
    val bloom = Sketch.bloomBuild(present, col("k"), nBits, 3)
    val probes = (0 until 1000).map(i => s"key$i").toDF("k")
    val res = Sketch.bloomMightContain(bloom, probes, col("k"), nBits, 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // the Bloom contract: every inserted key MUST read maybe-present
    assert((0 until 500).forall(i => res(s"key$i")))
    // ~1500 of 16128 bits set → expected FP rate ≈ (1500/16128)^3,
    // well under 1%; a 10% bound on the 500 absent probes is safe for
    // the fixed md5 hash family (deterministic, not a flaky sample)
    val fps = (500 until 1000).count(i => res(s"key$i"))
    assert(fps < 50)
  }

  test("bloom probe keeps duplicate probe rows distinct") {
    val present = Seq("a", "b").toDF("k")
    val bloom = Sketch.bloomBuild(present, col("k"), 63 * 16, 3)
    // at-least-once delivery: the same probe row arrives three times
    val probes = Seq("a", "a", "a", "zz").toDF("k")
    val res = Sketch.bloomMightContain(bloom, probes, col("k"), 63 * 16, 3)
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(res.length === 4) // one output row per INPUT row
    assert(res.count(_ == ("a", true)) === 3)
  }

  test("bloomFilterScan agrees with bloomMightContain on every probe") {
    val nBits = 63 * 64
    val present = (0 until 300).map(i => s"key$i").toDF("k")
    val bloom = Sketch.bloomBuild(present, col("k"), nBits, 3)
    val probes = (0 until 600).map(i => s"key$i").toDF("k")
    val viaJoin = Sketch.bloomMightContain(bloom, probes, col("k"), nBits, 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val viaScan = probes
      .withColumn("m", Sketch.bloomFilterScan(bloom, col("k"), nBits, 3))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaScan === viaJoin) // same hash family, same verdicts
  }

  test("bloom prefilter preserves the exact join result") {
    val build = Seq(1L, 3L, 5L, 7L).toDF("bk")
    val probe = (1L to 100L).map(i => (i % 10, i)).toDF("pk", "v")
    val nBits = 63 * 16
    val bloom = Sketch.bloomBuild(build, col("bk").cast("string"), nBits, 3)
    val plain = probe.join(build, col("pk") === col("bk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val pre = probe
      .filter(Sketch.bloomFilterScan(bloom, col("pk").cast("string"),
        nBits, 3))
      .join(build, col("pk") === col("bk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pre === plain) // no false negatives ⇒ identical join output
  }

  test("bloom bitmap is bounded by numBits/63 nonnegative words") {
    val present = (0 until 5000).map(i => s"k$i").toDF("k")
    val bloom = Sketch.bloomBuild(present, col("k"), 63 * 64, 4).collect()
    assert(bloom.length <= 64)
    assert(bloom.forall(_.getLong(1) >= 0L)) // sign bit never set
  }

  // --------------------------------------------------------------- HLL

  test("hll estimate lands near truth at n >> m") {
    val keys = (0 until 20000).map(i => s"u$i").toDF("k")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(keys, col("k"), 64), 64)
    // m=64 ⇒ ~13% standard error; the fixture is deterministic so
    // this is a fixed draw, not a flaky sample
    assert(math.abs(est - 20000) / 20000.0 < 0.25, s"est=$est")
  }

  test("hll linear-counting correction handles small cardinalities") {
    val keys = (0 until 30).map(i => s"v$i").toDF("k")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(keys, col("k"), 64), 64)
    assert(math.abs(est - 30) <= 10, s"est=$est")
  }

  test("hll registers are order- and duplication-invariant") {
    val a = (0 until 1000).map(i => s"x$i")
    def regs(xs: Seq[String]) =
      Sketch.hllRegisters(xs.toDF("k"), col("k"), 64)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(regs(a) == regs(a.reverse ++ a))
  }

  test("grouped hll registers equal per-group hllRegisters") {
    val df = (0 until 2000).map(i => (s"g${i % 3}", s"k$i")).toDF("g", "k")
    val grouped = Sketch.hllRegistersBy(df, col("g"), col("k"), 64)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketch.hllRegisters(df.filter(col("g") === g), col("k"), 64)
        .collect().map(r => (g, r.getLong(0)) -> r.getInt(1)).toMap
      assert(grouped.filter(_._1._1 == g) == solo)
    }
  }

  test("sketch merges are split-invariant (merge ≡ direct build)") {
    val keys = (0 until 3000).map(i => s"m${i % 700}").toDF("k")
    def third(p: Int) = keys.filter(
      abs(hash(col("k"))) % 3 === p)
    // CMS: counters add across any partition of the stream
    val direct = Sketch.countMin(keys, col("k"), 3, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketch.mergeCountMin(
        Sketch.mergeCountMin(Sketch.countMin(third(0), col("k"), 3, 8),
          Sketch.countMin(third(1), col("k"), 3, 8)),
        Sketch.countMin(third(2), col("k"), 3, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct)
    // HLL: registers max across the same partition
    val dH = Sketch.hllRegisters(keys, col("k"), 64)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mH = Sketch.mergeHll(
        Sketch.mergeHll(Sketch.hllRegisters(third(0), col("k"), 64),
          Sketch.hllRegisters(third(1), col("k"), 64)),
        Sketch.hllRegisters(third(2), col("k"), 64))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mH == dH)
    // Bloom: words OR
    val dB = Sketch.bloomBuild(keys, col("k"), 63 * 64, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mB = Sketch.mergeBloom(
        Sketch.mergeBloom(Sketch.bloomBuild(third(0), col("k"), 63 * 64, 3),
          Sketch.bloomBuild(third(1), col("k"), 63 * 64, 3)),
        Sketch.bloomBuild(third(2), col("k"), 63 * 64, 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mB == dB)
  }

  test("bloomNewKeys: verified truth with no false negatives") {
    val nBits = 63 * 256
    val ingested = (0 until 400).map(i => s"k${i * 2}").toDF("k") // evens
    val incoming = (0 until 500).map(i => s"k${i * 3}").toDF("k") // %3
    val res = Sketch.bloomNewKeys(ingested, incoming, "k", nBits, 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2))))
      .toMap
    assert(res.size === 500)
    for (i <- 0 until 500) {
      val n = i * 3
      val (might, isNew) = res(s"k$n")
      val trulyIngested = n % 2 == 0 && n < 800
      // exact truth always right, regardless of the probe
      assert(isNew === !trulyIngested)
      // Bloom contract: ingested keys always read maybe-present
      if (trulyIngested) assert(might)
    }
  }

  test("kmv: merge of overlapping halves equals the direct sketch") {
    import spark.implicits._
    val whole = (0 until 900).map(i => ("g", s"key$i")).toDF("grp", "k")
    val a = whole.filter(expr("substr(k, 4) % 3 != 0"))   // 2/3 of keys
    val b = whole.filter(expr("substr(k, 4) % 3 != 1"))   // overlapping 2/3
    val direct = Sketch.kmvBy(whole, col("grp"), col("k"), 32)
      .orderBy("rn").collect().map(r => (r.getInt(1), r.getLong(2)))
    val merged = Sketch.mergeKmv(
        Sketch.kmvBy(a, col("grp"), col("k"), 32),
        Sketch.kmvBy(b, col("grp"), col("k"), 32), 32)
      .orderBy("rn").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(merged.toSeq === direct.toSeq)
    assert(direct.length === 32)
  }

  test("kmv estimate: exact below saturation, ~1/sqrt(k) above") {
    import spark.implicits._
    val few = (0 until 9).map(i => ("small", s"s$i"))
    val many = (0 until 20000).map(i => ("big", s"b$i"))
    val regs = Sketch.kmvBy((few ++ many).toDF("grp", "k"),
      col("grp"), col("k"), 256)
    val est = Sketch.kmvEstimate(regs, 256)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(est("small") === ((9L, 9.0))) // unsaturated → exact
    val (nRegs, bigEst) = est("big")
    assert(nRegs === 256L)
    assert(math.abs(bigEst - 20000.0) / 20000.0 < 0.2,
      s"relative error too high: $bigEst")
  }

  test("kmvPairwiseJaccard: exact when unsaturated, close when not") {
    import spark.implicits._
    // exact case: A = {0..19}, B = {10..29} (J = 10/30); with k = 64
    // the union sketch holds EVERY hash, so the estimate is exact
    val small = ((0 until 20).map(i => ("A", s"x$i")) ++
      (10 until 30).map(i => ("B", s"x$i"))).toDF("grp", "k")
    val exact = Sketch.kmvPairwiseJaccard(
        Sketch.kmvBy(small, col("grp"), col("k"), 64), 64)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(exact.toSeq === Seq((30L, 10L, 333333L)))
    // saturated case: 2000-element sets with 50% overlap, k = 256 —
    // the estimate should land near J = 1/3
    val big = ((0 until 2000).map(i => ("A", s"y$i")) ++
      (1000 until 3000).map(i => ("B", s"y$i"))).toDF("grp", "k")
    val est = Sketch.kmvPairwiseJaccard(
        Sketch.kmvBy(big, col("grp"), col("k"), 256), 256)
      .collect().head.getLong(4)
    assert(math.abs(est - 333333L) < 80000L, s"estimate $est")
  }

  test("kmv registers are duplication- and order-invariant") {
    import spark.implicits._
    val once = (0 until 300).map(i => ("g", s"k$i"))
    val thrice = scala.util.Random.shuffle(once ++ once ++ once)
    val r1 = Sketch.kmvBy(once.toDF("grp", "k"), col("grp"), col("k"), 24)
      .orderBy("rn").collect().map(_.getLong(2)).toSeq
    val r2 = Sketch.kmvBy(thrice.toDF("grp", "k"), col("grp"), col("k"), 24)
      .orderBy("rn").collect().map(_.getLong(2)).toSeq
    assert(r1 === r2)
  }

  test("countSketch: signed counters sum to signed mass, estimate exact when collision-free") {
    import spark.implicits._
    // wide sketch → each term its own bucket per row → estimate exact
    val terms = (Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma")).toDF("t")
    val sk = Sketch.countSketch(terms, col("t"), d = 3, w = 512)
    // total signed mass per row = Σ±count, bounded by total count
    val rowMass = sk.groupBy("row")
      .agg(sum(abs(col("cnt"))).as("m")).collect()
      .map(_.getLong(1))
    assert(rowMass.forall(m => m >= 1L && m <= 11L))
    val probes = Seq(("alpha", 7L), ("beta", 3L), ("gamma", 1L),
      ("absent", 0L)).toDF("t", "true_cnt")
    val est = Sketch.countSketchEstimate(sk, probes, col("t"), 3, 512)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est === Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L,
      "absent" -> 0L))
    // even d rejected — the median must be a counter value
    intercept[IllegalArgumentException] {
      Sketch.countSketchEstimate(sk, probes, col("t"), 4, 512)
    }
  }

  test("quantileSampleBy: deterministic sample, merge = union sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1L to 200L).map(i => ("g", i, i * 10)).toDF("s", "id", "v")
    val full = Sketch.quantileSampleBy(rows, col("s"), col("id"),
      col("v"), 16).collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    // split the stream, sketch halves, merge — must equal the full sketch
    val h1 = Sketch.quantileSampleBy(rows.filter(col("id") <= 100),
      col("s"), col("id"), col("v"), 16)
    val h2 = Sketch.quantileSampleBy(rows.filter(col("id") > 100),
      col("s"), col("id"), col("v"), 16)
    val merged = Sketch.mergeQuantileSample(h1, h2, 16)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(merged === full)
    // determinism: re-sketching draws the identical sample
    val again = Sketch.quantileSampleBy(rows, col("s"), col("id"),
      col("v"), 16).collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(again === full)
  }

  test("quantileSampleEstimate: nearest-rank selection from the sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // sample of n=4 planted directly as registers: values 10,20,30,40
    val reg = Seq(("g", 1L, 111L, 10L), ("g", 2L, 222L, 20L),
      ("g", 3L, 333L, 30L), ("g", 4L, 444L, 40L))
      .toDF("grp", "rn", "pri", "v")
    val got = Sketch.quantileSampleEstimate(reg, Seq(250, 500, 1000))
      .collect().head
    // ⌈.25·4⌉=1 → 10, ⌈.5·4⌉=2 → 20, ⌈1·4⌉=4 → 40
    assert(got.getAs[Long]("n_sample") === 4L)
    assert((got.getAs[Long]("q_250"), got.getAs[Long]("q_500"),
      got.getAs[Long]("q_1000")) === ((10L, 20L, 40L)))
  }

  test("cmsJoinSizeEstimate: upper bound, exact when collision-free") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq("x", "x", "y", "z").toDF("t")   // fa: x2 y1 z1
    val b = Seq("x", "y", "y", "w").toDF("t")   // fb: x1 y2 w1
    val d = 4; val w = 64
    val sa = Sketch.countMin(a, col("t"), d, w)
    val sb = Sketch.countMin(b, col("t"), d, w)
    val est = Sketch.cmsJoinSizeEstimate(sa, sb, d)
      .collect().head.getLong(0)
    // true join size = 2·1 + 1·2 = 4; CMS is an upper bound, and at
    // 4 keys in 64 buckets the min row is collision-free → exact
    assert(est >= 4L && est <= 5L)
    // disjoint streams → 0
    val sc = Sketch.countMin(Seq("p", "q").toDF("t"), col("t"), d, w)
    assert(Sketch.cmsJoinSizeEstimate(sa, sc, d)
      .collect().head.getLong(0) === 0L)
  }
}
