package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a term stream — the sublinear heavy-hitter
  * summary for vocabularies too large to count exactly (the
  * training-corpus case: token/n-gram frequency at 100 TB where the
  * exact vocab would itself be TB-scale).
  *
  * Distributed-native shape: the sketch is a TALL frame (row, bucket,
  * cnt) produced by one partial-agg shuffle bounded by d×w counters —
  * never by vocabulary size; estimation is a broadcast join of the
  * (tiny) probe set against the counter frame.
  *
  * Deterministic end-to-end: term hashing is the md5-derived
  * [[TextAnalysis.hash60]] and the d pairwise hash rows reuse the
  * fixed-seed [[Dedup.perms]] constants, so the full counter table —
  * and therefore every estimate — is reproducible in the DuckDB
  * oracle (q93 interpolates the same constants).
  */
object Sketch {

  /** Build the d×w counter table: (row, bucket, cnt) with
    * cnt = number of term OCCURRENCES hashing to (row, bucket).
    */
  def countMin(df: DataFrame, termCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0)
    val h = TextAnalysis.hash60(termCol) % Dedup.P
    val buckets = array(Dedup.perms(d).map { case (a, b) =>
      ((h * a + b) % Dedup.P % w).cast("long")
    }: _*)
    df.select(posexplode(buckets).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("row", col("row").cast("long"))
  }

  /** Point estimates for a probe set: est(t) = min over the d rows of
    * the counter at (row, h_row(t) % w) — the classic CMS upper bound
    * (est ≥ true count; equality unless the term collides in every
    * row). `probes` must be small (the counter side is ≤ d×w rows and
    * is broadcast); returns the probe frame plus `cms_est`.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, termCol: Column,
      d: Int, w: Int): DataFrame = {
    val h = TextAnalysis.hash60(termCol) % Dedup.P
    val buckets = array(Dedup.perms(d).map { case (a, b) =>
      ((h * a + b) % Dedup.P % w).cast("long")
    }: _*)
    val pb = probes
      .select(probes.columns.map(col) :+
        posexplode(buckets).as(Seq("row", "bucket")): _*)
      .withColumn("row", col("row").cast("long"))
    pb.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      // a (row,bucket) the stream never touched has no counter row:
      // its count is 0, which min() must see
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Count-Sketch counter table (Charikar/Chen/Farach-Colton 2002):
    * like [[countMin]] but each occurrence adds a ±1 SIGN drawn from
    * an independent hash row, so collisions cancel in expectation and
    * the estimator is UNBIASED (CMS only upper-bounds). Counters are
    * (row, bucket, cnt) with cnt = Σ signs — the same d×w-bounded
    * tall frame, one partial-agg shuffle. Bucket rows use
    * [[Dedup.perms]] 0..d−1, sign rows d..2d−1 (parity of the hash),
    * all fixed-seed so the oracle interpolates the constants.
    */
  def countSketch(df: DataFrame, termCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0)
    val pr = Dedup.perms(2 * d)
    val h = TextAnalysis.hash60(termCol) % Dedup.P
    val entries = array((0 until d).map { j =>
      val (a, b) = pr(j)
      val (sa, sb) = pr(d + j)
      struct(lit(j.toLong).as("row"),
        ((h * a + b) % Dedup.P % w).cast("long").as("bucket"),
        when((h * sa + sb) % Dedup.P % 2 === 0, 1L).otherwise(-1L)
          .as("sgn"))
    }: _*)
    df.select(explode(entries).as("e"))
      .select(col("e.row").as("row"), col("e.bucket").as("bucket"),
        col("e.sgn").as("sgn"))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("sgn")).as("cnt"))
  }

  /** Count-Sketch point estimates: est(t) = MEDIAN over the d rows of
    * sgn_row(t) · C[row][bucket_row(t)] — `d` must be odd so the
    * median is an actual counter value (exact integer, no averaging).
    * The median materializes as element (d+1)/2 of the sorted d-array
    * per probe; untouched counters read 0. Probe side explodes to d
    * rows and joins the broadcast counter frame, as [[estimate]].
    */
  def countSketchEstimate(sketch: DataFrame, probes: DataFrame,
      termCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && d % 2 == 1, s"d must be odd for an integer median, got $d")
    val pr = Dedup.perms(2 * d)
    val h = TextAnalysis.hash60(termCol) % Dedup.P
    val entries = array((0 until d).map { j =>
      val (a, b) = pr(j)
      val (sa, sb) = pr(d + j)
      struct(lit(j.toLong).as("row"),
        ((h * a + b) % Dedup.P % w).cast("long").as("bucket"),
        when((h * sa + sb) % Dedup.P % 2 === 0, 1L).otherwise(-1L)
          .as("sgn"))
    }: _*)
    val pb = probes
      .select(probes.columns.map(col) :+ explode(entries).as("e"): _*)
      .select(probes.columns.map(col) :+ col("e.row").as("row") :+
        col("e.bucket").as("bucket") :+ col("e.sgn").as("sgn"): _*)
    pb.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .withColumn("__v", col("sgn") * coalesce(col("cnt"), lit(0L)))
      .groupBy(probes.columns.map(col): _*)
      .agg(element_at(array_sort(collect_list(col("__v"))), (d + 1) / 2)
        .as("cs_est"))
  }

  /** Two-pass heavy hitters: CMS candidate selection (no false
    * negatives — est ≥ true always) followed by an exact count
    * restricted to the candidate set. The distinct-term probe is one
    * vocabulary-bounded partial agg; EXACT counts are materialized
    * only for candidates (broadcast back into the second scan), so
    * collision-inflated candidates get eliminated (`confirmed` =
    * false) without ever counting the full vocabulary exactly.
    */
  def heavyHitters(df: DataFrame, termCol: Column, d: Int, w: Int,
      threshold: Long): DataFrame = {
    val sketch = countMin(df, termCol, d, w)
    val candidates = estimate(sketch,
        df.select(termCol.as("term")).distinct(), col("term"), d, w)
      .filter(col("cms_est") >= threshold)
    df.select(termCol.as("term"))
      .join(broadcast(candidates), Seq("term"))
      .groupBy(col("term"), col("cms_est"))
      .agg(count(lit(1)).as("exact_cnt"))
      .withColumn("confirmed", col("exact_cnt") >= threshold)
  }

  /** `numHashes` md5-salted bit positions in [0, numBits) for a key —
    * shared by [[bloomBuild]] and [[bloomMightContain]] so build and
    * probe can never disagree on the hash family.
    */
  private[graft] def bloomPositions(keyCol: Column, numBits: Int,
      numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      TextAnalysis.hash60(concat(keyCol, lit(s":b$i"))) % numBits): _*)

  /** Bits packed per bitmap word: 63, not 64 — a set bit 63 would
    * flip the BIGINT sign, and engines disagree on sign-bit shifts
    * (DuckDB raises on `1::BIGINT << 63`), so the portable bitmap
    * keeps every word nonnegative.
    */
  val BloomWordBits = 63

  /** Deterministic Bloom filter as a TALL bitmap frame (word_idx,
    * bits): the fast membership pre-filter for anti-join pruning at
    * corpus scale (e.g. "was this URL/doc hash ever ingested" before
    * the exact check). Build is one explode + one bit_or partial-agg
    * shuffle bounded by numBits/63 rows — never by key count. All
    * hashes are md5-derived, so the filter — including its FALSE
    * POSITIVES — is a deterministic function of the key set that an
    * oracle reproduces bit-for-bit.
    */
  def bloomBuild(df: DataFrame, keyCol: Column, numBits: Int,
      numHashes: Int): DataFrame = {
    require(numBits % BloomWordBits == 0 && numBits > 0 && numHashes > 0)
    df.select(explode(bloomPositions(keyCol, numBits, numHashes)).as("p"))
      .select((col("p") / BloomWordBits).cast("long").as("word_idx"),
        expr(s"shiftleft(1L, cast(p % $BloomWordBits as int))").as("mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Probe a [[bloomBuild]] bitmap: true ⇔ all `numHashes` bits are
    * set (maybe-present; false is DEFINITELY absent — the Bloom
    * contract). The bitmap (≤ numBits/64 rows) broadcasts; the probe
    * side stays distributed, so this composes as a scan-side
    * pre-filter for arbitrarily large probe frames.
    */
  def bloomMightContain(bloom: DataFrame, probes: DataFrame, keyCol: Column,
      numBits: Int, numHashes: Int): DataFrame = {
    // a per-row id keeps DUPLICATE probe rows distinct through the
    // regroup — the output must have exactly one row per input row
    // (at-least-once ingestion feeds repeats), not one per distinct row
    val keep = probes.columns.map(col) :+ col("__rid")
    probes.withColumn("__rid", monotonically_increasing_id())
      .select(keep :+
        explode(bloomPositions(keyCol, numBits, numHashes)).as("p"): _*)
      .select(keep :+ (col("p") / BloomWordBits).cast("long").as("word_idx") :+
        expr(s"shiftleft(1L, cast(p % $BloomWordBits as int))").as("mask"): _*)
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(keep: _*)
      .agg(min((coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) ===
        col("mask")).cast("int")).as("__allset"))
      .withColumn("might_contain", col("__allset") === 1)
      .drop("__allset", "__rid")
  }

  /** SCAN-SPEED Bloom pre-filter: the [[bloomBuild]] bitmap read to
    * a literal word array and returned as a pure Column predicate —
    * the filter a 100 TB join probe applies INSIDE its scan before
    * any shuffle, when the build side's keys are too many to
    * broadcast as a hash relation but their Bloom bitmap is KBs. No
    * false negatives, so `probe.filter(pred).join(build)` equals the
    * plain join — false positives only cost the prefilter some
    * selectivity, never correctness.
    *
    * EAGER at call time (the GeoEnrichment lesson, documented here):
    * the bitmap readout (≤ numBits/63 rows — the bounded-driver-state
    * pattern of the HLL register readout) runs when this method is
    * CALLED, not when the returned predicate first executes. Bit
    * tests use a literal mask lookup (element_at of a 63-entry
    * table) — no column-argument shifts, fully codegen'd.
    */
  def bloomFilterScan(bloom: DataFrame, keyCol: Column, numBits: Int,
      numHashes: Int): Column = {
    require(numBits % BloomWordBits == 0 && numBits > 0 && numHashes > 0)
    val words = Array.fill(numBits / BloomWordBits)(0L)
    bloom.select(col("word_idx"), col("bits")).collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val wordsLit = lit(words)
    val maskLut = lit(Array.tabulate(BloomWordBits)(1L << _))
    (0 until numHashes).map { i =>
      val p = TextAnalysis.hash60(concat(keyCol, lit(s":b$i"))) % numBits
      val w = (p / BloomWordBits).cast("int")
      val b = (p % BloomWordBits).cast("int")
      element_at(wordsLit, w + 1).bitwiseAND(element_at(maskLut, b + 1)) =!=
        lit(0L)
    }.reduce(_ && _)
  }

  /** HyperLogLog-style register table: the key's 60-bit md5 hash is
    * split into a register index (low bits, `m` must be a power of
    * two) and a substream value whose leading-zero rank feeds a max.
    * Integer-exact by construction — rank derives from the BIT LENGTH
    * of the substream value (binary-string length, not float log2),
    * so the full register table is oracle-reproducible. One partial
    * MAX shuffle bounded by m rows; registers no key touched are
    * absent (their rank is 0).
    */
  /** (register index, rank) columns for a key — the shared hash split
    * of [[hllRegisters]] and [[hllRegistersBy]].
    */
  private def hllIdxRank(keyCol: Column, m: Int): (Column, Column) = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val logM = java.lang.Integer.numberOfTrailingZeros(m)
    val restBits = 60 - logM
    val h = TextAnalysis.hash60(keyCol)
    val rest = shiftright(h, logM)
    val rank = when(rest === 0, lit(restBits + 1))
      .otherwise(lit(restBits) + 1 - length(conv(rest, 10, 2)))
      .cast("int")
    (h % m, rank)
  }

  def hllRegisters(df: DataFrame, keyCol: Column, m: Int): DataFrame = {
    val (idx, rank) = hllIdxRank(keyCol, m)
    df.select(idx.as("idx"), rank.as("rank"))
      .groupBy(col("idx"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** Per-group HLL registers: one MAX partial agg bounded by
    * groups × m rows — the "approx_count_distinct per dimension"
    * shape at corpus scale (distinct docs per source, distinct URLs
    * per host, …), each group's registers independently readable by
    * [[hllEstimate]].
    */
  def hllRegistersBy(df: DataFrame, groupCol: Column, keyCol: Column,
      m: Int): DataFrame = {
    val (idx, rank) = hllIdxRank(keyCol, m)
    df.select(groupCol.as("grp"), idx.as("idx"), rank.as("rank"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** ROLLING-window HLL registers per (group, window-end day) — the
    * sketch path for rolling distinct actives (WAU/MAU) where
    * [[graft.operators.TimeSeries.rollingDistinct]]'s exact explode
    * grows with the span: registers are max-mergeable, so each DAY's
    * register table (groups × m, tiny) expands to the `spanDays`
    * windows it covers and one MAX partial agg merges them — the
    * explode rides the SKETCH grain, never the event or user grain.
    * Only windows ending on observed (group, day)s are emitted.
    * Registers are exact integers: the whole rolling table
    * hash-gates even though the ESTIMATE it feeds is approximate.
    */
  def hllRollingRegistersBy(df: DataFrame, grpCol: Column,
      dayCol: Column, keyCol: Column, m: Int, spanDays: Int): DataFrame = {
    require(spanDays >= 1)
    val (idx, rank) = hllIdxRank(keyCol, m)
    val daily = df
      .select(grpCol.as("grp"), dayCol.as("day"), idx.as("idx"),
        rank.as("rank"))
      .groupBy(col("grp"), col("day"), col("idx"))
      .agg(max(col("rank")).as("rank"))
    val observed = daily.select(col("grp"), col("day")).distinct()
    val covered = daily
      .select(col("grp"), col("idx"), col("rank"), col("day"),
        explode(sequence(lit(0), lit(spanDays - 1))).as("__off"))
      .select(col("grp"), col("idx"), col("rank"),
        expr("date_add(day, __off)").as("day"))
    covered.join(observed, Seq("grp", "day"), "left_semi")
      .groupBy(col("grp"), col("day").as("window_end"), col("idx"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** EXACT bitmap index over a long row id (the OLAP bitmap-index
    * shape, 63 sign-safe bits per word like [[bloomBuild]]'s bitmap):
    * one word row per 63-id block with a bit per row satisfying the
    * predicate. Predicate algebra is word-wise bit ops on the
    * block-aligned join — AND/OR/COUNT never re-touch the data, which
    * is the point: secondary predicates evaluate against the index at
    * bits-per-row cost. Build is one partial-agg `bit_or` bounded by
    * id-range/63 rows.
    */
  def bitmapBuild(df: DataFrame, idCol: String, pred: Column): DataFrame =
    df.filter(pred)
      .select(expr(s"$idCol div 63").as("word_idx"),
        expr(s"shiftleft(1L, int($idCol % 63))").as("__b"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__b)").as("bits"))

  /** Word-wise boolean algebra over two [[bitmapBuild]] frames: the
    * full-outer block join with zero-fill makes AND/OR/XOR exact on
    * ragged block coverage.
    */
  def bitmapCombine(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("word_idx"), col("bits").as("bits_a"))
      .join(b.select(col("word_idx"), col("bits").as("bits_b")),
        Seq("word_idx"), "full_outer")
      .na.fill(0L, Seq("bits_a", "bits_b"))
      .select(col("word_idx"), col("bits_a"), col("bits_b"),
        col("bits_a").bitwiseAND(col("bits_b")).as("bits_and"),
        col("bits_a").bitwiseOR(col("bits_b")).as("bits_or"))

  /** Bloom-accelerated incremental ingestion: which incoming keys are
    * NEW relative to the ingested set? Keys whose Bloom probe says
    * definitely-absent skip the exact check entirely (the Bloom
    * contract has no false negatives); only maybe-present keys — a
    * small slice at realistic fill rates — reach the exact lookup
    * against the ingested snapshot. Returns the incoming frame plus
    * `might_contain` (the probe) and `is_new` (the verified truth).
    */
  def bloomNewKeys(ingested: DataFrame, incoming: DataFrame, keyName: String,
      numBits: Int, numHashes: Int): DataFrame = {
    val bloom = bloomBuild(ingested, col(keyName), numBits, numHashes)
    val probed = bloomMightContain(bloom, incoming, col(keyName),
      numBits, numHashes)
    val olds = probed.filter(col("might_contain"))
      .join(ingested.select(col(keyName)).distinct()
        .withColumn("__old", lit(true)), Seq(keyName), "left")
    val news = probed.filter(!col("might_contain"))
      .withColumn("__old", lit(false))
    news.unionByName(olds)
      .withColumn("is_new", !coalesce(col("__old"), lit(false)))
      .drop("__old")
  }

  /** Sketch algebra — the property that makes sketches distributed:
    * two sketches over DISJOINT streams merge into the sketch of the
    * union without touching the data again (executor partials,
    * datacenter rollups, day-over-day incremental sketches). CMS
    * counters add; HLL registers max; Bloom words OR.
    */
  def mergeCountMin(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  def mergeHll(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("idx"))
      .agg(max(col("max_rank")).as("max_rank"))

  def mergeBloom(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word_idx"))
      .agg(expr("bit_or(bits)").as("bits"))

  /** Cardinality estimate from a [[hllRegisters]] table: the classic
    * HLL harmonic mean with the small-range linear-counting
    * correction. Driver-side fold over ≤ m rows (m is a constant —
    * this is a scalar readout, not a distributed op).
    */
  def hllEstimate(registers: DataFrame, m: Int): Double = {
    val touched = registers.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val regs = (0L until m.toLong).map(i => touched.getOrElse(i, 0))
    val z = regs.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / z
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** KMV (k-minimum-values, Bar-Yossef et al.) distinct sketch: the k
    * smallest DISTINCT md5-derived 60-bit hashes of the key. Unlike
    * HLL it keeps actual hash values, so two sketches support
    * INTERSECTION estimates (and therefore Jaccard between streams),
    * not just unions. The k-th smallest hash h_k pins the estimate
    * (k−1)·2^60/h_k — uniform order statistics: k points below h_k
    * over a 2^60 range imply density k/h_k.
    *
    * Plan shape: distinct hashes (one partial-agg shuffle), then the
    * k smallest per group via a group-keyed window — output bounded
    * by groups × k. Registers are EXACT integers, so the whole sketch
    * hash-gates against a SQL replay (no approximation in the gate;
    * the approximation is only in what h_k is used FOR).
    */
  def kmvBy(df: DataFrame, groupCol: Column, keyCol: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2 (the estimate reads h_k with k-1 below)")
    df.select(groupCol.as("grp"), TextAnalysis.hash60(keyCol).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("grp"), col("rn"), col("h"))
  }

  /** Merge two [[kmvBy]] register tables over DISJOINT-or-not streams
    * (KMV tolerates overlap: distinct-union then re-take k smallest
    * is exactly the sketch of the union — same algebra class as
    * [[mergeHll]]).
    */
  def mergeKmv(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    a.select(col("grp"), col("h"))
      .unionByName(b.select(col("grp"), col("h")))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("grp"), col("rn"), col("h"))
  }

  /** Distinct-count estimates from a [[kmvBy]] table: one row per
    * group. Groups with fewer than k distinct hashes are EXACT (the
    * sketch holds the whole hash set — report its size); saturated
    * groups estimate (k−1)·2^60/h_k as ONE long/long IEEE division
    * (engine-stable, so the readout double hash-gates too).
    */
  /** Pairwise Jaccard between group sketches — the KMV capability HLL
    * cannot offer (registers are VALUES, so intersections estimate):
    * for groups (a, b), take the k smallest distinct hashes of
    * K_a ∪ K_b and count how many live in BOTH sketches; J ≈
    * matched/kk (Beyer et al.), exact when a pair's union sketch is
    * unsaturated. Everything is integer (matched, kk, ppm by integer
    * division), so the estimate table hash-gates. Work is bounded by
    * groups² × k — group-pair readout over sketches, the corpus was
    * reduced upstream by [[kmvBy]].
    */
  def kmvPairwiseJaccard(registers: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grps = registers.select(col("grp")).distinct()
    val pairs = grps.select(col("grp").as("grp_a"))
      .crossJoin(grps.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val regs = registers.select(col("grp").as("g"), col("h"))
    val tagged = pairs.join(broadcast(regs),
        col("g") === col("grp_a") || col("g") === col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"), col("h"))
      .agg(max(when(col("g") === col("grp_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("g") === col("grp_b"), 1).otherwise(0)).as("in_b"))
    val w = Window.partitionBy(col("grp_a"), col("grp_b"))
      .orderBy(col("h"))
    tagged
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("kk"),
        sum(col("in_a") * col("in_b")).as("matched"))
      .select(col("grp_a"), col("grp_b"), col("kk"), col("matched"),
        expr("(1000000 * matched) div kk").as("jacc_ppm"))
  }

  def kmvEstimate(registers: DataFrame, k: Int): DataFrame = {
    val maxH = lit(1152921504606846976L) // 2^60, exact in DOUBLE
    registers.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_regs"), max(col("h")).as("h_k"))
      .select(col("grp"), col("n_regs"),
        when(col("n_regs") < k, col("n_regs").cast("double"))
          .otherwise(lit((k - 1).toDouble) * maxH.cast("double") / col("h_k"))
          .as("est"))
  }

  /** Equi-join OUTPUT-SIZE estimation from KMV sketches — optimizer
    * statistics without running the join: |A⋈B| ≈ Ĵ·Û(A∪B) ·
    * (|A|/Û_A) · (|B|/Û_B) (estimated common distinct keys × the two
    * uniform-multiplicity factors). Inputs are two 2·k-register
    * sketches plus the two row counts — bytes per relation, so the
    * estimate costs one scan per side and a register-table merge,
    * never a shuffle of either table. Returns one row with every
    * component under the gate: kk/matched/jacc_ppm (exact integers),
    * the three Û doubles ([[kmvEstimate]]'s single IEEE chain each),
    * and `est_rows` — whose float chain is pinned left-to-right so an
    * oracle can replay it bit-exactly. Exact below saturation (both
    * sides' distinct keys ≤ k ⇒ matched/kk are exact and Û ≡ the true
    * distinct counts — the spec case); the uniform-multiplicity
    * assumption is the usual cardinality-estimator bias, reported,
    * not hidden (compare with the true size in the q298 gate).
    */
  def joinSizeEstimate(a: DataFrame, keyA: Column, b: DataFrame,
      keyB: Column, k: Int): DataFrame = {
    // the k-row register tables feed the Jaccard, the per-side
    // estimates AND the union estimate — checkpoint so each base
    // relation is scanned exactly once
    val regA = kmvBy(a.select(keyA.as("__k")), lit("a"), col("__k"), k)
      .localCheckpoint(true)
    val regB = kmvBy(b.select(keyB.as("__k")), lit("b"), col("__k"), k)
      .localCheckpoint(true)
    val both = regA.unionByName(regB)
    val jac = kmvPairwiseJaccard(both, k)
      .select(col("kk"), col("matched"), col("jacc_ppm"))
    val uA = kmvEstimate(regA, k).select(col("est").as("u_a"))
    val uB = kmvEstimate(regB, k).select(col("est").as("u_b"))
    val uU = kmvEstimate(
        mergeKmv(regA.withColumn("grp", lit("u")),
          regB.withColumn("grp", lit("u")), k), k)
      .select(col("est").as("u_union"))
    val nA = a.agg(count(lit(1)).as("rows_a"))
    val nB = b.agg(count(lit(1)).as("rows_b"))
    jac.crossJoin(uA).crossJoin(uB).crossJoin(uU)
      .crossJoin(nA).crossJoin(nB)
      .withColumn("est_rows",
        ((col("matched").cast("double") / col("kk").cast("double")) *
          col("u_union")) *
          ((col("rows_a").cast("double") / col("u_a")) *
            (col("rows_b").cast("double") / col("u_b"))))
  }

  /** Misra-Gries candidate pass: per PARTITION, a bounded table of
    * `k` counters scanned once (decrement-all on overflow — the
    * classic streaming summary). Guarantee (pigeonhole): any key with
    * partition-local frequency > n_p/k survives its partition's
    * summary, so any key with GLOBAL frequency > n/k survives the
    * union — the candidate set is a SUPERSET of the true >n/k heavy
    * hitters, with ≤ k·partitions candidates total (driver never
    * sees more). The candidate VALUES depend on partition layout;
    * only the superset property is contractual — which is why
    * [[mgHeavyHitters]] closes with an exact re-count.
    */
  def mgCandidates(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 2)
    import df.sparkSession.implicits._
    val keys = df.select(keyCol.cast("string").as("key")).as[String]
    keys.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { key =>
        if (counters.contains(key)) counters(key) += 1L
        else if (counters.size < k - 1) counters(key) = 1L
        else {
          // decrement-all; drop zeros — O(k) amortized per overflow
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.foreach { case (kk, v) => if (v <= 0L) dead += kk }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
  }

  /** EXACT heavy hitters (frequency·k > n, strict) in two passes with
    * bounded memory: MG candidate generation (pass 1) then an exact
    * re-count restricted to the broadcast candidate set (pass 2).
    * The output is the TRUE heavy-hitter set regardless of how MG's
    * partition-dependent candidates fell out — the superset guarantee
    * means no true hitter is missed, and the exact filter removes
    * every false candidate. At 100 TB: pass 1 is a scan with k-sized
    * state per task; pass 2 is a scan with a broadcast semi-join and
    * a candidate-keyed partial agg — no full-cardinality groupBy
    * ever happens, which is the point versus the naive
    * `GROUP BY key HAVING count·k > n` the oracle runs.
    */
  def mgHeavyHitters(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 2)
    import df.sparkSession.implicits._
    val keys = df.select(keyCol.cast("string").as("key")).as[String]
    // pass 1: per-partition MG summary AND partition row count in the
    // same scan; the summary is ≤ k·partitions rows — checkpoint it so
    // candidates and the total derive without re-reading the source
    val summary = keys.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { key =>
        np += 1L
        if (counters.contains(key)) counters(key) += 1L
        else if (counters.size < k - 1) counters(key) = 1L
        else {
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.foreach { case (kk, v) => if (v <= 0L) dead += kk }
          dead.foreach(counters.remove)
        }
      }
      Iterator.single(("", np, true)) ++
        counters.keysIterator.map(kk => (kk, 0L, false))
    }.toDF("key", "np", "is_total").localCheckpoint()
    val candidates = broadcast(
      summary.filter(!col("is_total")).select(col("key")).distinct())
    val total = summary.filter(col("is_total"))
      .agg(sum(col("np")).as("__n"))
    // pass 2: exact re-count restricted to the broadcast candidates
    keys.toDF("key").join(candidates, "key")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("__n"))
      .select(col("key"), col("cnt"))
  }

  /** Bottom-k priority-sample QUANTILE sketch — the rank-query member
    * of the sketch family (CMS: frequency, Bloom: membership, HLL/KMV:
    * cardinality, MG: heavy hitters; this: quantiles). Priority =
    * hash60("qs:"‖id) — a pure function of the row id — so the k-row
    * sample per group is a DETERMINISTIC uniform sample: both engines
    * draw the identical rows and the whole register table hash-gates
    * (the KMV discipline; classic reservoir sampling never can).
    * Mergeable with the same algebra as [[mergeKmv]]: union, re-take
    * k smallest priorities.
    *
    * One partial-agg-free projection + a group-keyed window over the
    * (grp-bounded × k) frame; registers carry the VALUE alongside the
    * priority, which is what turns a distinct-count sketch into a
    * rank sketch.
    */
  def quantileSampleBy(df: DataFrame, groupCol: Column, idCol: Column,
      valCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    df.select(groupCol.as("grp"),
        TextAnalysis.hash60(concat_ws(":", lit("qs"), idCol)).as("pri"),
        valCol.cast("long").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("pri"), col("v"))))
      .filter(col("rn") <= k)
      .select(col("grp"), col("rn"), col("pri"), col("v"))
  }

  /** Merge two [[quantileSampleBy]] register tables: union + re-take
    * the k smallest priorities per group. Overlapping streams are
    * fine — a row's priority is a function of its id, so duplicates
    * collapse on (pri, v).
    */
  def mergeQuantileSample(a: DataFrame, b: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    a.select(col("grp"), col("pri"), col("v"))
      .unionByName(b.select(col("grp"), col("pri"), col("v")))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("pri"), col("v"))))
      .filter(col("rn") <= k)
      .select(col("grp"), col("rn"), col("pri"), col("v"))
  }

  /** Nearest-rank quantile estimates from a [[quantileSampleBy]]
    * table: for each permille p, the sample value at rank
    * ⌈p·n/1000⌉ in (v, pri) order — SELECTED values, never
    * interpolated (the q128 discipline), so estimates are exact
    * integers. Output: (grp, n_sample, q_<p> …).
    */
  def quantileSampleEstimate(registers: DataFrame,
      permilles: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000))
    val ranked = registers
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("pri")))
        .cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("grp"))))
    val qs = permilles.map { p =>
      max(when(col("vr") ===
        expr(s"($p * n + 999) div 1000"), col("v"))).as(s"q_$p")
    }
    ranked.groupBy(col("grp"))
      .agg(max(col("n")).as("n_sample"), qs: _*)
  }

  /** CMS INNER-PRODUCT join-size estimation (Cormode & Muthukrishnan
    * 2005 §4.2): |A ⋈_k B| = Σ_k f_A(k)·f_B(k) is upper-bounded by
    * min over the d rows of Σ_w cmsA[row][w]·cmsB[row][w] — the
    * query-planner cardinality probe that costs two d×w sketches
    * instead of a join. Both sketches must share (d, w) and the
    * fixed-seed hash rows ([[countMin]] does by construction).
    * Returns one row: (est = the min, per the classic bound
    * est ≥ true). Exact integers — the d row-products are sums over
    * the ≤ d×w counter frame; nothing data-sized.
    */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame,
      d: Int): DataFrame = {
    val dots = a.select(col("row"), col("bucket"), col("cnt").as("ca"))
      .join(b.select(col("row"), col("bucket"), col("cnt").as("cb")),
        Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("ca") * col("cb")).as("rowdot"))
    // a row with NO shared bucket has dot 0 — it must reach the min,
    // not vanish from the inner join (disjoint streams → est 0)
    a.sparkSession.range(d).select(col("id").as("row"))
      .join(dots, Seq("row"), "left")
      .agg(min(coalesce(col("rowdot"), lit(0L))).as("est"))
  }
}
