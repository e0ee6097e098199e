package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Corpus-assembly operators for training-data pipelines: deterministic
  * train/validation/test splits and token-budget shard packing — the
  * two steps that turn a filtered, deduplicated document set into the
  * layout a trainer actually reads.
  *
  * Scale shape: [[hashSplit]] is a pure projection (no shuffle, no
  * RNG); [[packShards]] is a distributed prefix sum — per-bucket
  * windows run in parallel and the only global ordering ever
  * materialized is one row per bucket, broadcast back. Neither needs a
  * single-partition pass over the corpus, so both survive 100 TB.
  */
object Corpus {

  /** Deterministic hash split: assign each row to a named split by an
    * md5-derived bucket of `idCol` + `salt`. Membership is a pure
    * function of the id — stable across runs, engines, partitionings,
    * and corpus growth (adding documents never reassigns existing
    * ones), which is what makes held-out sets trustworthy. `weights`
    * are integer proportions, e.g. ("train",8),("val",1),("test",1).
    *
    * Returns the input plus `bucket` (0 until Σweights) and `split`.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive integer proportions")
    val total = weights.map(_._2).sum
    val bucket = pmod(graft.expressions.Md5Hash60.hash60Native(
      concat_ws(":", col(idCol), lit(salt))), lit(total.toLong))
    // cumulative upper bounds: bucket < bounds(i) ⇒ weights(i)._1
    val bounds = weights.map(_._2).scanLeft(0)(_ + _).tail
    val withBucket = df.withColumn("bucket", bucket)
    val split = weights.zip(bounds).dropRight(1)
      .foldRight(lit(weights.last._1): Column) { case (((name, _), b), els) =>
        when(col("bucket") < b, lit(name)).otherwise(els)
      }
    withBucket.withColumn("split", split)
  }

  /** Deterministic source-mixture sampling: keep each row with a
    * per-source rate (the "20% of crawl, 100% of books" corpus-mixing
    * step), decided by the same md5-bucket device as [[hashSplit]] —
    * membership is a pure function of (id, salt), so the sampled
    * mixture is stable across runs, engines, and corpus growth, and
    * re-running with a higher rate strictly GROWS the sample
    * (u < threshold is monotone in the threshold: no resampling churn
    * when mixture weights are retuned).
    *
    * Pure filter projection — no shuffle, runs inside the scan.
    * Rates are exact integer thresholds out of 1e6.
    */
  def mixtureSample(df: DataFrame, idCol: String, salt: String,
      sourceCol: String, rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val M = 1000000L
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1))
    val u = pmod(graft.expressions.Md5Hash60.hash60Native(
      concat_ws(":", col(idCol), lit(salt))), lit(M))
    val thr = rates.toSeq.sortBy(_._1)
      .foldRight(lit((defaultRate * M).toLong): Column) {
        case ((src, r), els) =>
          when(col(sourceCol) === src, lit((r * M).toLong)).otherwise(els)
      }
    df.filter(u < thr)
  }

  /** Temperature-based source rebalancing (the XLM-R style mixture
    * flattening): each source keeps rate
    * `(n_min / n_s)^(1-alpha)` — alpha = 1 keeps everything (natural
    * distribution), alpha = 0 equalizes all sources down to the
    * smallest, alpha = 0.5 is the customary halfway flattening. The
    * per-source counts are a BOUNDED driver readout (one row per
    * source — the kmeansIterate pattern), the rates become plan-time
    * integer thresholds, and the filter itself is [[mixtureSample]]'s
    * scan-speed md5-bucket predicate — rerunning with a different
    * alpha never resamples surviving docs of an unchanged rate.
    *
    * Gate note: alpha = 0.5 routes through `math.sqrt`, which is
    * IEEE-correctly-rounded and therefore bit-identical in any SQL
    * oracle; other alphas go through `math.pow`, whose last-ulp
    * behavior is libm-specific — fine in production, but a hash gate
    * should pin alpha = 0.5.
    *
    * Rows with a NULL source never match a rate branch and fall to
    * [[mixtureSample]]'s defaultRate (1.0 here) — null-source docs
    * are kept in full rather than silently dropped.
    */
  def temperatureMixture(df: DataFrame, idCol: String, salt: String,
      sourceCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0 && alpha <= 1)
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) df
    else {
      val nMin = counts.values.min.toDouble
      val rates = counts.map { case (s, n) =>
        val ratio = nMin / n
        s -> (if (alpha == 0.5) math.sqrt(ratio)
              else math.pow(ratio, 1 - alpha))
      }
      mixtureSample(df, idCol, salt, sourceCol, rates, defaultRate = 1.0)
    }
  }

  /** Context-window chunking: split each document's token stream into
    * overlapping chunks of `chunkTokens` whitespace tokens with
    * `overlap` tokens carried between consecutive chunks — the step
    * that turns variable-length documents into trainer-sized pieces.
    * Start offsets are 0, step, 2·step, … (step = chunkTokens −
    * overlap); the tail chunk may be short; empty documents produce
    * no chunks.
    *
    * Pure projection + one explode — no shuffle, no per-document
    * state, so chunking runs inside the 100 TB scan.
    *
    * Returns (input columns…, chunk_ix, chunk_tokens, chunk_text).
    */
  /** Sentence-boundary chunk packing — the RAG-ingestion chunker
    * [[chunk]] is NOT: sentences are packed greedily in document
    * order into chunks of at most `budgetTokens` whitespace tokens,
    * and a sentence is NEVER split (an oversized sentence becomes its
    * own over-budget chunk; mid-sentence cuts are what embedding
    * retrieval quality dies of). Greedy reset-cumsum is genuinely
    * sequential per document, so it runs as ONE higher-order
    * `aggregate` fold over the doc's ordered sentence array —
    * document-bounded state, no window, no shuffle beyond the per-doc
    * groupBy; the same fold replays in SQL as a recursive CTE.
    *
    * Output: (idCol, chunk_id, n_sentences, chunk_tokens, chunk_text)
    * with chunk_text the space-joined sentences in order. Documents
    * with no sentences emit no chunks.
    */
  def packSentenceChunks(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budget must be >= 1, got $budgetTokens")
    val sents = TextAnalysis.sentences(df, idCol, textCol)
      .withColumn("__t", TextAnalysis.nTokens(col("sentence")).cast("long"))
    val perDoc = sents.groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct(col("sent_idx"), col("sentence"), col("__t")))).as("__ss"))
    val zero = struct(lit(0L).as("cid"), lit(0L).as("used"),
      array().cast("array<bigint>").as("out"))
    val folded = perDoc.withColumn("__cids",
      aggregate(col("__ss"), zero, (st, x) => {
        val t = x.getField("__t")
        val over = st.getField("used") > 0 &&
          st.getField("used") + t > budgetTokens
        val cid = when(over, st.getField("cid") + 1L)
          .otherwise(st.getField("cid"))
        struct(cid.as("cid"),
          when(over, t).otherwise(st.getField("used") + t).as("used"),
          concat(st.getField("out"), array(cid)).as("out"))
      }).getField("out"))
    val rows = folded.select(col(idCol),
        explode(zip_with(col("__ss"), col("__cids"),
          (s, c) => struct(s.getField("sent_idx").as("sent_idx"),
            s.getField("sentence").as("sentence"),
            s.getField("__t").as("t"), c.as("chunk_id")))).as("r"))
      .select(col(idCol), col("r.sent_idx").as("sent_idx"),
        col("r.sentence").as("sentence"), col("r.t").as("t"),
        col("r.chunk_id").as("chunk_id"))
    rows.groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("t")).as("chunk_tokens"),
        array_join(transform(
          sort_array(collect_list(struct(col("sent_idx"), col("sentence")))),
          s => s.getField("sentence")), " ").as("chunk_text"))
  }

  def chunk(df: DataFrame, textCol: String, chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val nToks = size(col("__toks"))
    val starts = when(nToks === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nToks - 1, lit(step)))
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .select(df.columns.map(col) :+ col("__toks") :+
        posexplode(starts).as(Seq("chunk_ix", "__start")): _*)
      .withColumn("chunk_ix", col("chunk_ix").cast("long"))
      .withColumn("chunk_tokens",
        least(lit(chunkTokens), nToks - col("__start")).cast("long"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkTokens))))
      .drop("__toks", "__start")
  }

  /** Token-budget shard packing: lay documents out in `idCol` order and
    * assign each to the shard its first token lands in
    * (`shard_id = start_offset / budget`) — contiguous shards of
    * ≈`budget` tokens, the standard pre-tokenization layout step.
    *
    * The global running sum is computed WITHOUT a global window: ids
    * are range-bucketed (`bucketSize` ids per bucket), the running sum
    * within each bucket is a parallel window, and bucket offsets come
    * from a second window over ONE ROW PER BUCKET (tiny by
    * construction) that is broadcast back. At 100 TB the only ordered
    * single-partition pass is over the bucket list, not the corpus.
    *
    * `tokenCol` must be a non-null integral column (coalesce upstream).
    * Offsets use floor(double) division — exact below 2^53 total
    * tokens, three orders of magnitude above a 100 TB corpus.
    *
    * Returns the input plus `start_off` and `shard_id`.
    */
  def packShards(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, bucketSize: Long = 1L << 16): DataFrame = {
    require(budget > 0 && bucketSize > 0)
    // a NON-numeric id must fail loudly at the first bad row (with
    // ANSI off, a plain cast would null out and the offsets join would
    // silently return ZERO rows), while numeric-valued STRING ids
    // (CSV ingestion) keep working; try_cast never throws, so the
    // curated error below fires under any ANSI setting
    val idNum = expr(s"try_cast($idCol as double)")
    val bucketed = df.withColumn("__bucket",
      when(col(idCol).isNotNull && idNum.isNull,
          raise_error(concat(
            lit(s"packShards: non-numeric id in '$idCol': "),
            col(idCol).cast("string"))))
        .otherwise(floor(idNum / lit(bucketSize.toDouble)))
        .cast("long"))
    val w1 = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
    val withRun = bucketed.withColumn("__run", sum(col(tokenCol)).over(w1))
    val totals = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(tokenCol)).as("__tot"))
    val w2 = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(col("__bucket"),
      coalesce(sum(col("__tot")).over(w2), lit(0L)).as("__off"))
    withRun.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("start_off", col("__off") + col("__run") - col(tokenCol))
      .withColumn("shard_id",
        floor(col("start_off") / lit(budget.toDouble)).cast("long"))
      .drop("__bucket", "__run", "__off")
  }

  /** EXACT per-group quantiles by the nearest-rank definition:
    * quantile p = the value whose rank (value asc, tiebreak asc) is
    * ceil(p·n) — integer-deterministic given a total sort key, so the
    * corpus length profile (p50/p90/p99 tokens per source) is
    * hash-gateable. One window pass per group.
    *
    * 100 TB note: the window partitions by `groupCol`, so one group's
    * rows land on one task — exact quantiles fundamentally need a
    * per-group total order. With bounded group cardinality (sources,
    * languages, shards) this is the right tool; for quantiles OVER THE
    * WHOLE CORPUS use a mergeable sketch (the [[Sketch]] pattern)
    * instead of one giant partition.
    *
    * Output: (groupCol, n_docs, q_<pp> …) one row per group.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    // output columns are q_<round(p*100)> — reject ps that collide
    // (e.g. 0.501 and 0.504 both name q_50)
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"quantile column names collide for ps=$ps")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .withColumn("__rnk", row_number().over(w))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val qAggs = ps.map { p =>
      max(when(col("__rnk") === ceil(lit(p) * col("__n")),
        col(valueCol))).as(s"q_${(p * 100).round}")
    }
    ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_docs"), qAggs: _*)
  }

  /** EXACT whole-corpus quantiles over an integer column WITHOUT a
    * global sort or a single giant partition: iterative value-range
    * bisection. The nearest-rank quantile p is the smallest value v
    * with count(x <= v) >= ceil(p·n) — the count function over the
    * integer domain is monotone, so each quantile binary-searches its
    * value interval, and ALL quantiles advance together in ONE
    * partial-agg pass per round (a handful of `sum(when(x <= mid))`
    * counters). Rounds = ⌈log2(max - min)⌉ — ~40 passes even for a
    * full 64-bit-range column, each a map-side-combined scan with a
    * 1-row collect, so driver state is O(quantiles), never O(rows).
    *
    * This is the scale path [[exactQuantiles]]'s scaladoc points at
    * for corpus-wide profiles: same nearest-rank definition, no
    * per-group total order. Callers iterating at 100 TB should cache
    * the projected single-column frame; at any scale the passes are
    * shuffle-free.
    *
    * Output: ONE row (n_rows, q_<pp> …); empty input ⇒ n_rows = 0
    * with null quantiles.
    */
  def quantilesBisect(df: DataFrame, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"quantile column names collide for ps=$ps")
    val spark = df.sparkSession
    val v = col(valueCol).cast("long")
    // O(log range) aggregate probes re-scan this single-column frame;
    // persist so an expensive upstream pipeline (e.g. the q346 LM
    // scoring) computes once, not once per probe
    val vals = df.select(v.as("__v")).filter(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = vals.agg(count(lit(1)), min(col("__v")), max(col("__v")))
      .collect()(0)
    val n = head.getLong(0)
    val names = ps.map(p => s"q_${(p * 100).round}")
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      names.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.LongType, nullable = true)))
    if (n == 0L) {
      val row = org.apache.spark.sql.Row.fromSeq(
        0L +: names.map(_ => null))
      return spark.createDataFrame(
        java.util.Arrays.asList(row), schema)
    }
    val vMin = head.getLong(1)
    val vMax = head.getLong(2)
    val ranks = ps.map(p => math.ceil(p * n).toLong)
    // invariant per quantile: the answer lies in [lo, hi] INCLUSIVE —
    // no vMin-1 sentinel (which would underflow at Long.MinValue).
    // Probe points go through BigInt so the interval arithmetic can
    // never wrap even on a full 64-bit-range column.
    val lo = Array.fill(ps.size)(vMin)
    val hi = Array.fill(ps.size)(vMax)
    // MULTI-WAY bisection (optimization r15): each pass probes B−1
    // evenly spaced points per open quantile instead of one midpoint,
    // resolving log2(B) bits per pass — same smallest-v-with-
    // count≥rank answer, ~4× fewer aggregate jobs (each pass is one
    // fixed-overhead job over the cached single-column frame, so the
    // driver loop's job COUNT is the whole cost at any scale). The
    // extra counters are sum(when) columns riding the same partial
    // agg — map-side work, no new pass.
    val B = 16
    while (ranks.indices.exists(i => lo(i) < hi(i))) {
      val open = ranks.indices.filter(i => lo(i) < hi(i))
      def probesOf(i: Int): Seq[Long] = {
        val l = BigInt(lo(i))
        val span = BigInt(hi(i)) - l
        // floor points l + span·j/B, j = 1..B−1: all in [lo, hi), so
        // every branch strictly shrinks the interval; when span < B
        // they cover the whole open interval and the next pass closes
        (1 until B).map(j => (l + span * j / B).toLong).distinct
      }
      // distinct probes: quantiles often share intervals early on
      val mids = open.flatMap(probesOf).distinct
      val cnts = vals.agg(
          count(lit(1)).as("__c"), // anchor agg; keeps agg() total
          mids.map(m => sum(when(col("__v") <= m, 1L).otherwise(0L))
            .as(s"__le_$m")): _*)
        .collect()(0)
      val leOf = mids.zipWithIndex
        .map { case (m, j) => m -> cnts.getLong(j + 1) }.toMap
      open.foreach { i =>
        // smallest probe meeting the rank bounds the answer above;
        // its predecessor bounds it below (count(x ≤ v) is monotone)
        val ms = probesOf(i).sorted
        val idx = ms.indexWhere(m => leOf(m) >= ranks(i))
        if (idx < 0) lo(i) = ms.last + 1
        else {
          hi(i) = ms(idx)
          if (idx > 0) lo(i) = ms(idx - 1) + 1
        }
      }
    }
    val row = org.apache.spark.sql.Row.fromSeq(n +: lo.toSeq)
    spark.createDataFrame(java.util.Arrays.asList(row), schema)
  }

  /** APPROXIMATE per-group quantiles without any per-group total
    * order: floor(value/binWidth) buckets the scan into a
    * (group × bin) grid — ONE partial agg — then a cumulative count
    * over the tiny grid picks the first bin reaching the ceil(p·n)
    * nearest-rank. Estimate = the bin's UPPER edge
    * ((bin+1)·binWidth): strictly above the true quantile, off by at
    * most binWidth (exactly binWidth when the quantile sits on a bin
    * lower edge).
    *
    * Third member of the quantile family: [[exactQuantiles]] (exact,
    * per-group total order — one group per task), [[quantilesBisect]]
    * (exact, whole-corpus, multi-pass), and this (approximate,
    * per-group, single-pass) — the 100 TB group profile when
    * binWidth resolution suffices. The grid is
    * |groups| × |range/binWidth| rows — data-volume independent — so
    * the window pass over it is free at any scale.
    *
    * Output: (groupCol, n_docs, q_<pp>_est …) one row per group.
    */
  def histogramQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, binWidth: Double, ps: Seq[Double]): DataFrame =
    histogramQuantilesFromGrid(
      histogramGrid(df, groupCol, valueCol, binWidth), groupCol,
      binWidth, ps)

  /** The (group × bin) counter grid [[histogramQuantiles]] reads —
    * public because the SAME aggregation runs as STREAMING STATE
    * (counts are mergeable, so a streaming Complete-mode agg
    * maintains the grid continuously; see q206) with the quantile
    * pick as a batch readout over the materialized counters.
    */
  def histogramGrid(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    df.groupBy(col(groupCol),
        floor(col(valueCol) / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("bin_n"))
  }

  /** The quantile pick over a [[histogramGrid]] frame: cumulative
    * count per group in bin order, first bin reaching ceil(p·n).
    * Runs over the dimension-bounded grid — free at any data scale.
    */
  def histogramQuantilesFromGrid(grid: DataFrame, groupCol: String,
      binWidth: Double, ps: Seq[Double]): DataFrame = {
    require(binWidth > 0 && ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"quantile column names collide for ps=$ps")
    val cum = grid
      .withColumn("__cum", sum(col("bin_n"))
        .over(Window.partitionBy(col(groupCol)).orderBy(col("bin"))))
      .withColumn("__n",
        sum(col("bin_n")).over(Window.partitionBy(col(groupCol))))
    val qAggs = ps.map { p =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")),
        (col("bin") + 1).cast("double") * lit(binWidth)))
        .as(s"q_${(p * 100).round}_est")
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_docs"), qAggs: _*)
  }

  /** Per-shard ZONEMAP — the data-skipping index (min/max/count per
    * clustering key per shard) a 100 TB table maintains per file /
    * row-group so range predicates prune I/O before any scan. One
    * partial-agg shuffle keyed by shard; output is shard-cardinality-
    * bounded, the frame a writer would persist next to the data (or
    * feed to a metastore). Pair with [[graft.functions.ZOrder]] keys
    * as shardCol to make multi-column ranges skippable.
    *
    * Output: (shard, n_rows, min_<k>, max_<k> …) one row per shard.
    */
  def zonemap(df: DataFrame, shardCol: Column,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
    df.groupBy(shardCol.as("shard"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Split-leakage audit: canonical-text fingerprints that appear in
    * MORE THAN ONE [[hashSplit]] partition — the held-out-set
    * integrity check every training pipeline should run after
    * splitting (splits are keyed by id, so textual duplicates with
    * different ids CAN straddle train/test; this surfaces exactly
    * those). One fingerprint-keyed partial agg; output is bounded by
    * the leaky-fingerprint count.
    *
    * Output: (fp, n_docs, n_splits, splits) for leaky fps only.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      salt: String, weights: Seq[(String, Int)]): DataFrame = {
    val sp = hashSplit(df.select(col(idCol), col(textCol)), idCol, salt,
        weights)
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp"), col("split"))
    sp.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        array_join(array_sort(collect_set(col("split"))), ",").as("splits"))
      .filter(col("n_splits") > 1)
  }

  /** Deterministic negative sampling for contrastive training: k
    * pseudo-random negatives per anchor, drawn by the same md5-bucket
    * device as [[hashSplit]] — negatives are a pure function of
    * (anchor, j, salt), so pairs are reproducible across runs,
    * engines, and partitionings, and never collected to the driver.
    * Requires a DENSE id space [0, n) (the standard contrastive-set
    * contract; non-dense ids get a precomputed dense index upstream).
    * An anchor-colliding draw shifts to (draw + 1) mod n.
    *
    * The corpus count rides a ONE-ROW broadcast (the q125/q135
    * pattern); the per-anchor explode is k-bounded. Output:
    * (idCol, j, neg_id).
    */
  def negativeSample(ids: DataFrame, idCol: String, k: Int,
      salt: String): DataFrame = {
    require(k >= 1)
    val tot = ids.agg(count(lit(1)).as("__n"))
    ids.select(col(idCol))
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("__n"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__draw", pmod(graft.expressions.Md5Hash60.hash60Native(
        concat_ws("#", col(idCol), col("j"), lit(salt))), col("__n")))
      .withColumn("neg_id",
        when(col("__draw") === col(idCol),
          (col("__draw") + 1) % col("__n")).otherwise(col("__draw")))
      .select(col(idCol), col("j").cast("long").as("j"), col("neg_id"))
  }

  /** Deterministic stratified sampling: exactly `nPerGroup` rows per
    * group (fewer when the group is smaller), chosen by md5-hash
    * order — the eval-set construction step ("3 docs per source",
    * "100 per language") with [[hashSplit]]'s reproducibility
    * contract: membership is a pure function of (id, salt), ties
    * broken by id. One window per group partition; the window input
    * is the raw frame, so groups must individually fit a partition —
    * the per-group-bounded analog of [[exactQuantiles]].
    *
    * Returns the input plus `sample_rank` (1-based within group).
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      salt: String, nPerGroup: Int): DataFrame = {
    require(nPerGroup >= 1)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(graft.expressions.Md5Hash60.hash60Native(
        concat_ws(":", col(idCol), lit(salt))), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= nPerGroup)
  }

  /** Range-predicate pruning over a [[zonemap]]: marks each shard
    * skippable when its [min,max] interval for `key` cannot intersect
    * [lo, hi] — the planner-side half of data skipping (the list of
    * surviving shards is what a scan would actually open).
    */
  /** Importance weighting for data selection (the DSIR idea — Xie et
    * al. 2023, arXiv:2302.03169 — in exact integer form): score each
    * document by how target-like its tokens are, where
    * weight_ppm(t) = ⌊1e6 · count_target(t) / count_all(t)⌋ over the
    * corpus term counts and a document's score is the sum of its
    * tokens' weights (with multiplicity). The paper's hashed-n-gram
    * log-ratio becomes a count-ratio so every intermediate is a
    * BIGINT — order-free and oracle-exact (ln() is engine-divergent
    * in the last ulp; a ratio isn't).
    *
    * `isTarget` marks the rows whose distribution we want more of
    * (e.g. a trusted language or source). Zero-token documents score
    * 0 and stay present.
    *
    * Scale: one token-keyed partial agg (vocab-bounded), one
    * token-keyed join back, one doc-keyed sum — the exact shape of
    * the inverted-index build (q101); stopword-grade hot tokens are
    * AQE's skew-join case.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
    val weights = toks.groupBy(col("__t"))
      .agg(count(lit(1)).as("__c_all"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__c_tgt"))
      .select(col("__t"),
        expr("(1000000 * __c_tgt) div __c_all").as("__w_ppm"))
    val perDoc = toks.join(weights, Seq("__t"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"), sum(col("__w_ppm")).as("__s"))
    val base = docs.select(col(idCol))
    base.join(perDoc, base(idCol) === perDoc("__id"), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_tokens"),
        coalesce(col("__s"), lit(0L)).as("score_ppm"))
  }

  /** Deterministic weighted sampling without replacement, k per group:
    * the integer-arithmetic cousin of A-ES reservoir sampling —
    * priority(row) = h60(id:salt) div weight, keep the k smallest
    * priorities per group. Higher weight ⇒ proportionally smaller
    * priority ⇒ more likely in the sample, and the whole draw is a
    * pure function of (id, salt): reproducible, engine-portable, and
    * stable under corpus growth the way [[hashSplit]] membership is.
    * (A-ES's u^(1/w) keys need pow/log — engine-divergent doubles;
    * the integer form keeps the gate exact.)
    *
    * Nonpositive weights are excluded (a weight-0 item must never be
    * drawn; guarding here keeps the division total).
    *
    * Scale: a projection plus one per-group top-k window — k-bounded
    * state per group, the q12 pattern.
    */
  def weightedPrioritySample(df: DataFrame, idCol: String,
      weightCol: String, groupCol: String, k: Int, salt: String)
      : DataFrame = {
    require(k >= 1)
    val pri = df
      .filter(col(weightCol) > 0)
      .withColumn("__h", graft.expressions.Md5Hash60.hash60Native(
        concat_ws(":", col(idCol), lit(salt))))
      .withColumn("priority", expr(s"__h div $weightCol"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority"), col(idCol))
    pri.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("rn"), col(idCol), col("priority"))
  }

  /** EXACT Efraimidis–Spirakis weighted sampling without replacement,
    * k per group, in deterministic fixed point. A-ES draws the k
    * largest u^(1/w) keys — equivalently the k SMALLEST −ln(u)/w —
    * which is the distributionally correct weighted draw
    * [[weightedPrioritySample]]'s h div w priority only approximates
    * (u/w overweights heavy items near u→0). The log that made the
    * true key engine-divergent is now exact integer arithmetic:
    *   u    = (h32+1) / 2^32,  h32 = h60(id:salt) mod 2^32
    *   L    = −ln(u)·1e6      = lnPpm(2^32, h32+1)   (i64, exact)
    *   pri  = L·1e9 div w                            (i64, exact)
    * and the draw is a pure function of (id, salt): reproducible,
    * engine-portable (the oracle replays the identical shift-and-
    * square CTE), stable under corpus growth. Bounds: L ≤ 22.2e6 ppm
    * (ln 2^32), so L·1e9 < 2.3e16 — no overflow for any weight ≥ 1.
    *
    * Nonpositive weights are excluded (weight 0 must never be drawn;
    * guarding keeps the division total). Weights must be integral —
    * fractional weights would truncate silently in the div.
    *
    * Scale: a projection plus one per-group top-k window — the rank
    * limit pushes into WindowGroupLimit, so per-partition state is
    * k-bounded (the q434 discipline).
    */
  /** The exact A-ES key as a Column — ONE definition shared by the
    * batch sampler below and the streaming reservoir
    * ([[graft.streaming.Streams.weightedSampleStream]]), so the
    * stream ≡ batch parity gate compares identical priorities.
    */
  def aesPriority(id: Column, weight: Column, salt: String): Column = {
    val h32 = graft.expressions.Md5Hash60.hash60Native(
      concat_ws(":", id, lit(salt))) % 4294967296L
    graft.functions.FixedPoint.idiv(
      graft.functions.FixedPoint.lnPpm(lit(4294967296L), h32 + 1L)
        * 1000000000L, weight)
  }

  def weightedSampleAes(df: DataFrame, idCol: String,
      weightCol: String, groupCol: String, k: Int, salt: String)
      : DataFrame = {
    require(k >= 1)
    requireIntegralKey(df, weightCol, "weightedSampleAes")
    val pri = df
      .filter(col(weightCol) > 0)
      .withColumn("priority_e9",
        aesPriority(col(idCol), col(weightCol), salt))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority_e9"), col(idCol))
    pri.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("rn"), col(idCol),
        col(weightCol).cast("long").as("weight"), col("priority_e9"))
  }

  /** 2-D PARETO FRONTIER (skyline) per group, both objectives
    * maximized — multi-objective corpus selection without collapsing
    * to a single weighted score: keep a row iff NO other row is ≥ in
    * both objectives and ≠ as a pair (equal pairs are mutually
    * non-dominating — both kept; strict Pareto dominance). The
    * length-vs-diversity, quality-vs-freshness trade surfaces as the
    * frontier instead of an arbitrary λ.
    *
    * One sort, two windows — never a pair join: sorted x-descending,
    * a row survives iff its y strictly exceeds every y at strictly
    * greater x (RANGE frame `UNBOUNDED PRECEDING .. 1 PRECEDING`,
    * exact for integral x) AND its y is the max within its own x
    * (same-x dominance). Per-group sort is the only shuffle; frames
    * carry one running max — O(1) state per row.
    */
  def paretoFrontier(df: DataFrame, grpCol: String, xCol: String,
      yCol: String, idCol: String): DataFrame = {
    requireIntegralKey(df, xCol, "paretoFrontier")
    val wx = Window.partitionBy(col(grpCol)).orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val weq = Window.partitionBy(col(grpCol), col(xCol))
    df.withColumn("__m1", max(col(yCol)).over(wx))
      .withColumn("__m2", max(col(yCol)).over(weq))
      .filter((col("__m1").isNull || col(yCol) > col("__m1")) &&
        col(yCol) === col("__m2"))
      .select(col(grpCol), col(idCol), col(xCol), col(yCol))
  }

  /** Sequence-packing efficiency audit: with one document per padded
    * sequence of `seqLen` tokens, each doc costs ceil(n/seqLen)·seqLen
    * slots; the per-group report totals real tokens vs padded slots
    * and the waste rate in ppm — the number that justifies switching
    * to [[packShards]]-style bin packing. Zero-token docs occupy no
    * sequence. Pure projection + one partial agg.
    */
  def paddingWaste(docs: DataFrame, textCol: String, groupCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1)
    docs
      .select(col(groupCol).as("__g"),
        TextAnalysis.nTokens(col(textCol)).cast("long").as("__n"))
      .withColumn("__padded",
        expr(s"((__n + ${seqLen - 1}) div $seqLen) * $seqLen"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        sum(col("__padded")).as("n_padded"))
      .select(col("__g").as(groupCol), col("n_docs"), col("n_tokens"),
        col("n_padded"),
        when(col("n_padded") === 0L, lit(0L))
          .otherwise(expr("(1000000 * (n_padded - n_tokens)) div n_padded"))
          .as("waste_ppm"))
  }

  /** Exact proportional allocation of `total` slots across groups by
    * row count — Hamilton's largest-remainder method: every group
    * gets ⌊n_g·total/N⌋ slots, and the ⌊·⌋ remainder slots go to the
    * largest fractional remainders (ties to the smaller group key, so
    * the allocation is total and deterministic). The quota step of a
    * stratified eval draw: Σ quota = total exactly, no group
    * over-represented by more than one slot.
    *
    * All arithmetic is BIGINT (remainders compared as n_g·total mod N
    * — same order as the fraction, no division error). Group counts
    * are one partial agg; N and the rank window run over
    * group-cardinality rows, never corpus rows.
    */
  def quotaAllocation(df: DataFrame, groupCol: String, total: Long)
      : DataFrame = {
    require(total >= 0)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val withN = counts.crossJoin(
      broadcast(counts.agg(sum(col("n_rows")).as("__N"))))
    val based = withN
      .withColumn("base", expr(s"(n_rows * $total) div __N"))
      .withColumn("__rem", expr(s"(n_rows * $total) % __N"))
    val spare = based
      .withColumn("__spare", expr(s"$total - sum(base) OVER ()"))
    val ranked = spare.withColumn("__rk",
      row_number().over(Window.orderBy(col("__rem").desc, col(groupCol))))
    ranked
      .select(col(groupCol), col("n_rows"),
        (col("base") + when(col("__rk") <= col("__spare"), 1L)
          .otherwise(0L)).as("quota"))
  }

  def pruneRange(zm: DataFrame, key: String, lo: Column,
      hi: Column): DataFrame =
    zm.withColumn("can_skip",
      col(s"max_$key") < lo || col(s"min_$key") > hi)

  /** Stratified K-fold assignment with EXACT fold balance: within
    * each stratum, rows order by a salted md5 (uniform, deterministic,
    * data-independent) and deal round-robin into k folds — every
    * stratum's folds differ in size by at most 1, which plain
    * hash-mod assignment ([[hashSplit]]) only achieves in
    * expectation. The cost of exactness is one stratum-keyed window
    * (hashSplit is a pure projection); use this for EVALUATION folds
    * where balance bias matters, hashSplit for growth-stable corpus
    * membership.
    */
  def stratifiedKFold(df: DataFrame, idCol: String, strataCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 2)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(concat_ws("#", col(idCol), lit(salt))), col(idCol))
    df.withColumn("fold",
      ((row_number().over(w) - 1) % k).cast("int"))
  }

  /** Winsorization at exact per-group percentile fences — the
    * outlier-robust feature-prep step (clip, don't drop): values
    * outside the group's [p_lo, p_hi] SELECTED quantile values clamp
    * to the fence. Fences come from [[exactQuantiles]] (nearest-rank
    * selection, never interpolation), so every output value is an
    * input value — the clip is pure comparison and the whole table
    * hash-gates even on double columns. The group-bounded fence frame
    * broadcasts onto the scan.
    */
  def winsorize(df: DataFrame, grpCol: String, valCol: String,
      tieCol: String, loP: Double, hiP: Double): DataFrame = {
    require(loP < hiP)
    val loName = s"q_${(loP * 100).round}"
    val hiName = s"q_${(hiP * 100).round}"
    val fences = exactQuantiles(df, grpCol, valCol, tieCol, Seq(loP, hiP))
      .select(col(grpCol), col(loName).as("fence_lo"),
        col(hiName).as("fence_hi"))
    df.join(broadcast(fences), Seq(grpCol))
      .withColumn("winsorized",
        when(col(valCol) < col("fence_lo"), col("fence_lo"))
          .when(col(valCol) > col("fence_hi"), col("fence_hi"))
          .otherwise(col(valCol)))
      .withColumn("is_clipped",
        col(valCol) < col("fence_lo") || col(valCol) > col("fence_hi"))
      .select(col(grpCol), col(tieCol), col(valCol), col("fence_lo"),
        col("fence_hi"), col("winsorized"), col("is_clipped"))
  }

  /** GPT-style document packing layout: documents concatenate in
    * doc-id order with ONE separator (EOS) token after each, and the
    * token stream chunks into fixed `blockSize` training blocks that
    * CROSS document boundaries — the standard pretraining batch
    * layout (vs [[packShards]], which never splits a document). This
    * computes the layout's bookkeeping without materializing tokens:
    * each doc's global token offset is an exclusive prefix sum of
    * (len + 1), and its first/last block are integer divisions —
    * all exact integers, so the whole placement table hash-gates.
    * `spans_boundary` marks docs split across training blocks (the
    * attention-mask/doc-boundary accounting a loader needs).
    *
    * Scale: the placement is a global prefix sum, computed through
    * [[prefixSum]]'s order-aligned id buckets — per-bucket parallel
    * windows plus one bucket-count-sized offset frame, never a
    * data-sized single-partition window.
    * Empty docs occupy only their separator token.
    */
  def packBlocks(docs: DataFrame, idCol: String, textCol: String,
      blockSize: Int): DataFrame = {
    require(blockSize >= 2)
    // exclusive prefix of (tokens + separator) in id order via the
    // bucketed prefix sum — no data-sized single-partition window
    docs
      .select(col(idCol),
        TextAnalysis.nTokens(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__w", col("n_tokens") + 1L)
      .transform(d => prefixSum(d, idCol, "__w"))
      .withColumn("global_start", col("cum") - col("__w"))
      .drop("__w", "cum")
      .withColumn("start_block",
        expr(s"global_start div $blockSize"))
      .withColumn("end_block",
        expr(s"(global_start + greatest(n_tokens, 1L) - 1L) div $blockSize"))
      .withColumn("spans_boundary", col("end_block") > col("start_block"))
  }

  /** Deterministic Poisson-bootstrap confidence interval for the mean
    * of an integer measure. Replicate weights are a pure function of
    * (id, replicate, salt): the first md5 nibble maps through a
    * 16-slot table approximating Poisson(1) — P(0)=P(1)=6/16,
    * P(2)=3/16, P(3)=1/16 — so both engines draw the identical
    * resample and the CI hash-gates (classic RNG bootstrap can never
    * cross-engine-gate). The R replicates are R PAIRED AGGREGATES in
    * ONE scan — no ×R row explode, no shuffle beyond the 1-row global
    * agg (partial aggregation does the work map-side); at 100 TB the
    * bootstrap costs one table read regardless of R. Replicate means
    * are exact integer milli-units (Σw·x·1000 div Σw); the CI picks
    * nearest-rank order statistics of the R means — selected values,
    * never interpolated.
    *
    * Returns one row: (n, point_milli, ci_lo_milli, ci_hi_milli,
    * n_replicates, mean_of_means_milli).
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valCol: String,
      replicates: Int, salt: String, loPct: Int = 5, hiPct: Int = 95)
      : DataFrame = {
    require(replicates >= 2 && loPct >= 0 && hiPct <= 100 && loPct < hiPct)
    def weight(r: Int): Column = {
      val nib = conv(substring(md5(
        concat_ws("#", col(idCol).cast("string"), lit(r.toString),
          lit(salt))), 1, 1), 16, 10).cast("long")
      when(nib < 6, 0L).when(nib < 12, 1L).when(nib < 15, 2L)
        .otherwise(3L)
    }
    val aggs = Seq(count(lit(1)).cast("long").as("n"),
      sum(col(valCol).cast("long")).as("sx")) ++
      (0 until replicates).flatMap { r =>
        Seq(sum(weight(r)).as(s"__w_$r"),
          sum(weight(r) * col(valCol).cast("long")).as(s"__wx_$r"))
      }
    // R md5 draws per row make the PARTIAL agg the CPU-dense part,
    // and it runs inside the scan stage — one task on an under-split
    // local source. Spread first (no-op at scale, guide §2.2); long
    // sums are exactly associative, so partition placement can't
    // change a bit.
    val one = Spread.byKey(df.select(col(idCol), col(valCol)), idCol)
      .agg(aggs.head, aggs.tail: _*)
    val means = array((0 until replicates).map { r =>
      expr(s"__wx_$r * 1000L div greatest(__w_$r, 1L)")
    }: _*)
    val sorted = array_sort(means)
    val loRank = math.max(1, math.ceil(loPct * replicates / 100.0).toInt)
    val hiRank = math.max(1, math.ceil(hiPct * replicates / 100.0).toInt)
    one.select(col("n"),
      expr("sx * 1000L div greatest(n, 1L)").as("point_milli"),
      element_at(sorted, loRank).as("ci_lo_milli"),
      element_at(sorted, hiRank).as("ci_hi_milli"),
      lit(replicates.toLong).as("n_replicates"),
      // checksum over ALL replicate means (not just the two picked
      // ranks) so the gate pins every resample, kept as an exact sum
      // — a mean would need a second integral division step
      aggregate(sorted, lit(0L), (acc, x) => acc + x)
        .as("sum_means_milli"))
  }

  /** Group-aware K-fold assignment (sklearn's GroupKFold shape, made
    * deterministic): every row's fold is a pure md5 function of its
    * GROUP key, so all members of a group — all exact/near duplicates
    * of a document, all rows of a user — land in the SAME fold by
    * construction. That is the leakage guarantee a plain row-hash
    * split cannot give: with near-duplicates split across train and
    * eval, the eval score measures memorization, not generalization
    * (the q147 split-leakage audit detects the disease; this operator
    * prevents it). Any group label works — a fingerprint for exact
    * dups, a [[graft.operators.Dedup.dedupGroups]] component id for
    * near-dups, a user/session id for temporal data.
    *
    * A projection: no shuffle, no state, fold boundaries stable under
    * any re-partitioning or incremental append (a new member of an
    * old group joins its group's fold forever).
    */
  def groupKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    df.withColumn("fold",
      TextAnalysis.hash60(col(groupCol).cast("string")) % k)
  }

  /** Corpus-global sentence dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" sentence rule, C4's
    * span discipline at sentence grain): a sentence INSTANCE survives
    * iff its text is globally unique OR this document is the
    * minimum-id owner of the sentence — keep-first, so exactly one
    * copy of every duplicated sentence remains corpus-wide (all
    * instances inside the keeper document itself are retained; the
    * rule decides by document, not by instance).
    *
    * Returns one row per document: n_sents, n_dropped, and
    * `content_dedup` — the surviving sentences rejoined in document
    * order. Cost at 100 TB: the segmentation generator rides the
    * scan; ONE sentence-fingerprint partial-agg shuffle builds the
    * (fp → min owner, count) table; one fp-keyed join back; one
    * per-document reassembly agg. No driver state — the fingerprint
    * table is corpus-sized but never collected.
    */
  def dedupSentences(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val s = TextAnalysis.sentences(df, idCol, textCol)
      .withColumn("__fp", md5(col("sentence")))
    val owners = s.groupBy(col("__fp"))
      .agg(min(col(idCol)).as("__keep"), count(lit(1)).as("__n"))
    val kept = col("__n") === 1 || col(idCol) === col("__keep")
    s.join(owners, Seq("__fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sents"),
        sum(when(kept, 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(kept, struct(col("sent_idx"), col("sentence"))))),
            x => x.getField("sentence")),
          " ").as("content_dedup"))
  }

  /** Scalable global row numbering — `row_id` = 0-based rank of
    * `keyCol` in corpus-total order — WITHOUT the classic trap of
    * `row_number() OVER (ORDER BY key)`, whose empty partitionBy
    * funnels 100 TB through ONE task. Three-step shape (the
    * distributed zipWithIndex): (1) bucket every row by
    * ⌊key/bucketWidth⌋ — order-aligned because div is monotone on
    * non-negative keys; (2) count rows per bucket (one partial agg to
    * a #buckets-sized frame) and prefix-sum the counts — the only
    * single-partition window runs over that SMALL frame, thousands of
    * rows, never the data; (3) broadcast the offsets back and
    * row_number WITHIN each bucket (bucket-partitioned window — every
    * executor sorts only its buckets). Offset + in-bucket rank − 1 is
    * the exact global rank.
    *
    * Caller contract: `keyCol` non-negative and UNIQUE (ties would
    * make the in-bucket order, hence the numbering, nondeterministic).
    */
  /** Heaps'-law vocabulary-growth curve: unique-token count after
    * each 1/steps fraction of the corpus (in id order) — the
    * diminishing-returns audit run before committing to more crawl
    * volume. The classic formulation (distinct count per prefix) is
    * steps× full scans; this is ONE: a token's contribution to every
    * prefix is determined solely by its FIRST-occurrence rank, so one
    * groupBy(token).min(rank) + a steps-row bucket agg + a prefix sum
    * over the steps-row frame reproduce all prefixes exactly. All
    * integer. The only single-partition window runs over `steps`
    * rows; the corpus count() readout is one bounded driver scalar.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      steps: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(steps >= 1, s"steps must be >= 1, got $steps")
    // three consumers (count readout, token explode, doc buckets) —
    // persist so the ranking runs once per action, not three times;
    // blocks are freed by the ContextCleaner (the q214 discipline)
    val ranked = globalRowNumber(
      docs.select(col(idCol), col(textCol)), idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = ranked.count()
    // empty corpus: the step bucketing divides by n — return the
    // (empty) step frame instead of a divide-by-zero plan
    if (n == 0L) {
      return ranked.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("step",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("new_tokens",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("vocab",
            org.apache.spark.sql.types.LongType))))
    }
    def stepOf(name: String) =
      expr(s"least(${steps - 1}L, ($name * ${steps}L) div ${n}L)")
    val tok = ranked.select(col("row_id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
    val firstSeen = tok.groupBy(col("t"))
      .agg(min(col("row_id")).as("fr"))
    val newPerStep = firstSeen
      .groupBy(stepOf("fr").as("step"))
      .agg(count(lit(1)).as("new_tokens"))
    val docsPerStep = ranked
      .groupBy(stepOf("row_id").as("step"))
      .agg(count(lit(1)).as("n_docs"))
    docsPerStep.join(newPerStep, Seq("step"), "left")
      .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
      .withColumn("vocab",
        sum(col("new_tokens")).over(
          Window.orderBy(col("step"))
            .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Adjacent-bigram collocation lift: for every bigram with count ≥
    * `minCount`, lift_ppm = 10⁶·c(a,b)·N / (c(a)·c(b)) — the PMI
    * ratio without the log, kept in exact integer algebra so it
    * hash-gates. Bigrams come from a scan-local positional zip (no
    * window, no shuffle before the count aggs); the three count
    * frames join back bigram- and token-keyed. minCount prunes the
    * bigram tail BEFORE the joins — at 100 TB that filter is the
    * difference between joining the Zipf tail and joining a bounded
    * head. Overflow note: c(a,b)·N·10⁶ needs N² ≲ 9·10¹²·c⁻¹; beyond
    * ~10⁹ tokens compute in DECIMAL(38) or split the division.
    */
  def collocationLift(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = docs.select(col(idCol).as("__id"),
      TextAnalysis.tokens(lower(col(textCol))).as("__ts"))
    // vocabulary-bounded; serves the N readout plus TWO join probes —
    // persist so the corpus tokenizes once per action, not three times
    val uni = toks.select(explode(col("__ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = toks
      .select(explode(expr(
        "transform(slice(__ts, 1, greatest(size(__ts) - 1, 0)), " +
          "(x, i) -> struct(x AS a, __ts[i + 1] AS b))")).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minCount)
    // sum over an empty token frame is SQL NULL — default 0 (bi is
    // empty too, so the lift expression never evaluates on a row)
    val nTotal = Option(uni.agg(sum(col("c"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    bi.join(uni.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("cb")), Seq("b"))
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        expr(s"(cab * ${nTotal}L * 1000000L) div (ca * cb)")
          .as("lift_ppm"))
  }

  /** Distributed PREFIX SUM over a keyed order — the byte-offset
    * primitive behind concatenated shard layouts (each row's start
    * offset in the file that would result from concatenating
    * payloads in key order) and cumulative token accounting. The
    * naive form is `sum() OVER (ORDER BY key)` — a single-partition
    * window; this is the [[globalRowNumber]] decomposition applied
    * to SUMS: order-aligned buckets, per-bucket totals, a prefix sum
    * over the tiny bucket frame, then in-bucket running sums.
    * Adds `cum` (INCLUSIVE running total; exclusive start offset =
    * cum − value). Caller contract: `keyCol` unique and
    * non-negative; `valCol` long.
    */
  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): mask
    * deterministic token spans and emit the (input, targets) pair the
    * denoising objective trains on — input keeps unmasked tokens with
    * one `<extra_id_k>` sentinel per span, targets list each sentinel
    * followed by the tokens it hides.
    *
    * Span starts are HASH-chosen (md5 of "sc:doc:pos", 1-in-`everyK`)
    * so the noise is reproducible across engines and runs — the
    * property an oracle-gated (and resumable, at 100 TB) pipeline
    * needs where the paper samples randomly. Overlap resolution is
    * window-parallel, not greedy-sequential: a candidate start is
    * DROPPED if any candidate (selected or not) sits within the
    * previous `spanLen`−1 positions. This differs from greedy
    * resolution only when ≥3 candidates fall within one span length
    * (documented contract; decisions stay per-row so the operator
    * rides the scan).
    *
    * Scale: one token explode, one doc-keyed range window for the
    * overlap rule, one covered-position explode (spanLen× the starts
    * only), one doc-keyed rollup. No driver state.
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int, everyK: Int): DataFrame = {
    require(spanLen >= 1 && everyK >= 2)
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("tok"))
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rangeBetween(-(spanLen - 1).toLong, -1L)
    val sel = toks
      .withColumn("cand",
        when(TextAnalysis.hash60(concat_ws(":", lit("sc"),
          col("doc_id"), col("pos"))) % everyK === 0, 1).otherwise(0))
      .withColumn("sel", col("cand") === 1 &&
        coalesce(max(col("cand")).over(wPrev), lit(0)) === 0)
    val starts = sel.filter(col("sel"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos")))
        .cast("long") - 1)
      .select(col("doc_id"), col("pos").as("start"), col("k"))
    val covered = starts.select(col("doc_id"), col("k"), col("start"),
      explode(sequence(col("start"),
        col("start") + (spanLen - 1))).as("pos"))
    val pieces = sel.select(col("doc_id"), col("pos"), col("tok"))
      .join(covered, Seq("doc_id", "pos"), "left")
      .withColumn("in_piece",
        when(col("k").isNull, col("tok"))
          .when(col("pos") === col("start"),
            concat(lit("<extra_id_"), col("k"), lit(">"))))
      .withColumn("tgt_piece",
        when(col("k").isNotNull,
          when(col("pos") === col("start"),
            concat(lit("<extra_id_"), col("k"), lit("> "), col("tok")))
            .otherwise(col("tok"))))
    def joinSorted(c: Column): Column =
      array_join(transform(array_sort(collect_list(c)),
        s => s.getField("p")), " ")
    pieces.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_masked"),
        countDistinct(col("k")).as("n_spans"),
        joinSorted(when(col("in_piece").isNotNull,
          struct(col("pos"), col("in_piece").as("p")))).as("input_text"),
        joinSorted(when(col("tgt_piece").isNotNull,
          struct(col("pos"), col("tgt_piece").as("p"))))
          .as("targets_text"))
      .withColumn("masked_ppm",
        expr("n_masked * 1000000L div n_tokens"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * two hash-chosen token cuts c1 ≤ c2 split each document into
    * prefix/middle/suffix, re-emitted in PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — so an autoregressive
    * model learns infilling. Cut points derive from md5 of the doc id
    * (uniform over the n+1 boundary positions, then over the
    * remainder), deterministic where the paper samples — the
    * reproducibility an oracle gate and a resumable 100 TB run both
    * need. Pure projection; rides the scan.
    */
  def fimTransform(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks).cast("long")
    val c1 = TextAnalysis.hash60(
      concat_ws(":", lit("fim1"), col(idCol))) % (n + 1)
    val c2 = c1 + TextAnalysis.hash60(
      concat_ws(":", lit("fim2"), col(idCol))) % (n - c1 + 1)
    docs.select(col(idCol).as("doc_id"), toks.as("__t"), n.as("n_tokens"),
        c1.as("c1"), c2.as("c2"))
      .select(col("doc_id"), col("n_tokens"), col("c1"), col("c2"),
        concat(lit("<PRE> "),
          array_join(slice(col("__t"), lit(1), col("c1").cast("int")), " "),
          lit(" <SUF> "),
          array_join(slice(col("__t"), (col("c2") + 1).cast("int"),
            (col("n_tokens") - col("c2")).cast("int")), " "),
          lit(" <MID> "),
          array_join(slice(col("__t"), (col("c1") + 1).cast("int"),
            (col("c2") - col("c1")).cast("int")), " "))
          .as("psm_text"))
  }

  def prefixSum(df: DataFrame, keyCol: String, valCol: String,
      bucketWidth: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    requireIntegralKey(df, keyCol, "prefixSum")
    val b = df.withColumn("__bucket", expr(s"$keyCol div $bucketWidth"))
    val offsets = b.groupBy(col("__bucket"))
      .agg(sum(col(valCol)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__off"))
    b.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("cum", col("__off") +
        sum(col(valCol)).over(
          Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__bucket", "__off")
  }

  /** Deterministic distributed EPOCH SHUFFLE — the training-order
    * primitive: every epoch's order is the rank of md5(seed‖id), so
    * it is (a) reproducible bit-for-bit from (seed, id) alone, (b)
    * uncorrelated between seeds, and (c) computed WITHOUT a global
    * sort: the md5 hex prefix (top 8 bits) is an order-aligned bucket
    * key, so the [[globalRowNumber]] shape applies — 256 bucket
    * counts, a prefix sum over that tiny frame, in-bucket ranks.
    * `shard_id` = ⌊pos/shardSize⌋ gives the epoch's shard layout in
    * the same pass. Ties on the full hash break by id, so duplicate
    * ids are the only way to lose determinism (don't).
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
      shardSize: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    val keyed = df.withColumn("__k",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .withColumn("__b",
        conv(substring(col("__k"), 1, 2), 16, 10).cast("long"))
    val offsets = keyed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    keyed.join(broadcast(offsets), Seq("__b"))
      .withColumn("epoch_pos", col("__off") - 1 +
        row_number().over(Window.partitionBy(col("__b"))
          .orderBy(col("__k"), col(idCol))))
      .withColumn("shard_id", expr(s"epoch_pos div ${shardSize}L"))
      .drop("__b", "__off", "__k")
  }

  /** 1-based global rank over a (value, tie-keys…) total order
    * WITHOUT a data-sized single-partition window — the
    * [[globalRowNumber]] decomposition generalized to an arbitrary
    * integral sort value: truncating division is monotone, so
    * `value div bucketWidth` buckets are order-aligned; per-bucket
    * row_number + a prefix sum over the TINY bucket-count frame
    * compose the exact global rank. Ties beyond `tieCols` must be
    * don't-care for the caller (ties sharing value land in one
    * bucket, so any permutation inside a tie group keeps the group's
    * rank range). Adds `__rg`.
    *
    * Accepts any NUMERIC value column: integral types bucket by exact
    * `div`; fractional types (double/float/decimal — classifier
    * scores, ratios) bucket by `floor(v / width)`, equally monotone —
    * and since the within-bucket order uses the RAW value, precision
    * loss in the bucket key can only skew bucket sizes, never ranks.
    */
  def bucketedRankBy(df: DataFrame, valCol: String,
      tieCols: Seq[String], bucketWidth: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val bucketKey = df.schema(valCol).dataType match {
      case types.ByteType | types.ShortType | types.IntegerType |
          types.LongType => expr(s"$valCol div ${bucketWidth}L")
      case types.DoubleType | types.FloatType | (_: types.DecimalType) =>
        floor(col(valCol) / lit(bucketWidth)).cast("long")
      case t => throw new IllegalArgumentException(
        s"bucketedRankBy requires a numeric $valCol, got $t")
    }
    val b = df.withColumn("__rb", bucketKey)
    val offsets = b.groupBy(col("__rb"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__roff",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__rb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__rb"), col("__roff"))
    b.join(broadcast(offsets), Seq("__rb"))
      .withColumn("__rg", col("__roff") +
        row_number().over(Window.partitionBy(col("__rb"))
          .orderBy(col(valCol) +: tieCols.map(col): _*)).cast("long"))
      .drop("__rb", "__roff")
  }

  /** div-bucketing key contract shared by [[prefixSum]] /
    * [[globalRowNumber]]: the key must be integral (ids, ppm-scaled
    * scores). Fractional keys belong in [[bucketedRankBy]], which
    * floor-buckets them.
    */
  private def requireIntegralKey(df: DataFrame, keyCol: String,
      op: String): Unit = df.schema(keyCol).dataType match {
    case types.ByteType | types.ShortType | types.IntegerType |
        types.LongType => ()
    case t => throw new IllegalArgumentException(
      s"$op requires an integral $keyCol (div-bucketing contract), " +
        s"got $t — scale fractional values to integer ppm first, or " +
        "use bucketedRankBy which floor-buckets fractional types")
  }

  def globalRowNumber(df: DataFrame, keyCol: String,
      bucketWidth: Long = 1024L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    requireIntegralKey(df, keyCol, "globalRowNumber")
    val b = df.withColumn("__bucket", expr(s"$keyCol div $bucketWidth"))
    val offsets = b.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    b.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("row_id", col("__offset") - 1 +
        row_number().over(
          Window.partitionBy(col("__bucket")).orderBy(col(keyCol))))
      .drop("__bucket", "__offset")
  }
}

/** Quantile normalization across heterogeneous sources — score
  * calibration for mixed-provenance corpora: a quality/length score
  * from source A is not comparable to one from source B (different
  * scrapers, different units), so each row's score maps to the GLOBAL
  * distribution's value at the row's within-source quantile. After
  * normalization, "top 10% of source A" and "top 10% of source B"
  * mean the same number.
  *
  * Everything is SELECTION, never interpolation (the q128 nearest-rank
  * discipline): within-source rank r_s on a (value, id) total order,
  * target global rank ⌈r_s·N/n_s⌉ by integer cross-multiplication,
  * and the normalized value is the actual global value AT that rank,
  * joined by rank equality — exact integers end to end, so the whole
  * table hash-gates.
  *
  * Scale shape: the within-source ranks are source-keyed windows; the
  * rank→value map uses the bucketed global rank
  * ([[Corpus.bucketedRankBy]] — order-aligned value buckets, no
  * data-sized single-partition window) and the final lookup is a
  * plain equi-join on rank. The q199 histogram CDF remains the
  * approximate fallback when even the bucketed exact map is too
  * expensive.
  */
object QuantileNorm {

  def normalize(df: DataFrame, idCol: String, grpCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(idCol), col(grpCol), col(valCol))
    val wSrc = Window.partitionBy(col(grpCol))
      .orderBy(col(valCol), col(idCol))
    val ranked = base
      .withColumn("src_rank", row_number().over(wSrc).cast("long"))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy(col(grpCol))))
    val globalMap = Corpus.bucketedRankBy(base, valCol, Seq(idCol))
      .select(col("__rg"), col(valCol).as("normalized"))
    val total = base.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("target_rank",
        expr("(src_rank * __n + n_src - 1) div n_src"))
      .join(globalMap, col("target_rank") === col("__rg"))
      .select(col(idCol), col(grpCol), col(valCol), col("src_rank"),
        col("n_src"), col("target_rank"), col("normalized"))
  }
}
