package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic BI analytics shapes over the event/order fact tables:
  * rollup subtotals, pivot, calendar gap-fill with forward fill,
  * cohort retention, ordered funnel. The reference's BI-intake gold
  * tables feed exactly these downstream readouts
  * (reference: powerbi_main_fun.py gold-table consumers).
  *
  * All five are single-pass, key-partitioned aggregations: no
  * driver-side state, no cartesians; grids are (groups × days) or
  * (cohorts × offsets) — dimension-bounded, never fact-sized.
  */
object Analytics {

  /** ROLLUP subtotals: per (a, b), per a, and grand total in one
    * pass. Spark plans a rollup as ONE Expand + one partial agg —
    * the subtotal rows ride the same shuffle as the leaves, which is
    * the 100 TB win over unioning three groupBys (one fact scan, one
    * exchange). `gid` is `grouping_id()` (bit i set = column i
    * rolled up) so consumers can split levels without null-sniffing;
    * rolled-up keys surface as `total` rather than null to keep the
    * output total-orderable.
    */
  def rollupSummary(df: DataFrame, keyA: String, keyB: String,
      amount: Column): DataFrame =
    groupingSummary(df.rollup(col(keyA), col(keyB)), keyA, keyB, amount)

  /** CUBE: every subset of (a, b) — leaves, both one-key margins,
    * grand total — still ONE Expand + one partial agg ([[rollupSummary]]
    * minus the hierarchy assumption; 4 grouping sets instead of 3).
    * Same gid/total conventions.
    */
  def cubeSummary(df: DataFrame, keyA: String, keyB: String,
      amount: Column): DataFrame =
    groupingSummary(df.cube(col(keyA), col(keyB)), keyA, keyB, amount)

  private def groupingSummary(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      keyA: String, keyB: String, amount: Column): DataFrame =
    grouped
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(amount.cast("decimal(18,2)")).cast("double").as("amount"))
      .select(
        coalesce(col(keyA), lit("total")).as(keyA),
        coalesce(col(keyB), lit("total")).as(keyB),
        col("gid"), col("n"), col("amount"))

  /** Pivot long→wide: one output row per group, one `n_<value>`
    * column per pinned pivot value. The value list is EXPLICIT —
    * Spark otherwise collects distinct values to the driver to plan
    * the schema (a fact-table scan before the real job), and a
    * stable schema is what sinks need anyway. One partial agg; width
    * is |values|, data-independent.
    */
  def pivotCounts(df: DataFrame, groupCol: String, pivotCol: String,
      values: Seq[String]): DataFrame = {
    val wide = df.groupBy(col(groupCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
    wide.select(col(groupCol) +:
      values.map(v => coalesce(col(s"`$v`"), lit(0L)).as(s"n_$v")): _*)
  }

  /** Calendar gap-fill + forward fill: daily per-group counts on a
    * dense (group × day) grid spanning the GLOBAL [min, max] day, with
    * each gap day carrying the last observed count (0 before a
    * group's first observation) and flagged `was_gap`.
    *
    * The grid is built by exploding one `sequence(min, max)` per
    * group — groups × days rows, dimension-bounded. The forward fill
    * is the grouping trick (running count of non-null observations
    * names the carry segment; max over the segment carries the
    * value): two window passes over ONE (group, day) sort, no
    * self-join, and WindowExec spills rather than OOMs on a long
    * calendar.
    */
  def gapFillDaily(df: DataFrame, groupCol: String, tsCol: String)
      : DataFrame = {
    val daily = df
      .groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val grid = daily.select(col(groupCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(groupCol),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val seg = Window.partitionBy(col(groupCol)).orderBy(col("day"))
    val carry = Window.partitionBy(col(groupCol), col("__seg"))
    grid.join(daily, Seq(groupCol, "day"), "left")
      .withColumn("__seg", count(col("n")).over(seg))
      .withColumn("n_filled",
        coalesce(max(col("n")).over(carry), lit(0L)))
      .withColumn("was_gap", col("n").isNull)
      .select(col(groupCol), col("day"), col("n_filled"), col("was_gap"))
  }

  /** Cohort retention: users bucketed by first-activity week (the
    * cohort), then for each (cohort, week-offset k) the count of
    * cohort members active k weeks later. Two key-partitioned aggs
    * (user→cohort, then (cohort, offset)→distinct users) joined on
    * the user key; output is cohorts × offsets rows.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val weekly = df.select(col(userCol),
      to_date(date_trunc("week", col(tsCol))).as("week")).distinct()
    val cohorts = weekly.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    weekly.join(cohorts, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Relative-standing metrics per row: percent_rank, cume_dist and
    * an ntile bucket over (group, value) — the "where does this row
    * sit in its group" readout. The order key includes `tieCol`
    * (unique) so every rank/bucket is deterministic: ntile's
    * assignment among value-ties is ORDER-dependent, and an
    * under-specified sort makes the output flap between runs.
    * percent_rank/cume_dist are single int/int IEEE divisions —
    * engine-stable doubles. One shuffle+sort; WindowExec streams the
    * partition (rank functions need no frame buffer).
    */
  def rankMetrics(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    df.select(col(tieCol), col(groupCol), col(valueCol),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      ntile(buckets).over(w).cast("long").as("bucket"))
  }

  /** Ordered funnel — a user reaches stage k only via a stage-k event
    * STRICTLY AFTER their stage-(k-1) reach time (earliest such
    * event). Built as a left fold: reach₁ = min ts of stage-1 events
    * per user; reach_k = min ts of stage-k events joined to
    * reach_{k-1} on the user key with ts > reach time. Every step is
    * a key-partitioned filter + join + partial-min agg on the
    * stage-k slice of the fact table — no sort, no per-user event
    * collection, no driver state. Returns one row per stage:
    * (stage_idx, stage, n_users), monotonically non-increasing.
    *
    * Each stage-k count branch re-derives reaches 1..k (the frames
    * are lazy); at fleet scale persist the reach frames — they are
    * user-keyed, i.e. already the small side.
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val events = df.select(col(userCol).as("__u"),
      col(typeCol).as("__e"), col(tsCol).as("__ts"))
    val reaches = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val slice = events.filter(col("__e") === stage)
        val eligible = prev match {
          case None => slice
          case Some(r) => slice
            .join(r.withColumnRenamed("__rt", "__prev"), Seq("__u"))
            .filter(col("__ts") > col("__prev"))
        }
        Some(eligible.groupBy(col("__u")).agg(min(col("__ts")).as("__rt")))
    }.flatten
    reaches.zip(stages).zipWithIndex.map { case ((r, stage), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_.unionByName(_)).orderBy(col("stage_idx"))
  }

  /** EXACT AUC-ROC by the Mann-Whitney rank-sum identity — the
    * classifier-evaluation readout without threshold sweeps or
    * trapezoids: AUC = U/(n⁺·n⁻) where U counts positive-negative
    * pairs the score orders correctly (ties ½). Doubled to stay
    * integer under ties: 2U = 2·Σranks⁺ − n⁺(n⁺+1), with tied scores
    * taking the tie group's average rank — computed as min+max rank
    * per tie group (2·avg = min+max, exact in integers). One global
    * sort (scores at readout grain); the final AUC is ONE long/long
    * IEEE division, so even the double hash-gates.
    */
  def aucExact(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(scoreCol).as("__s"),
      col(labelCol).cast("boolean").as("__y"))
    // global rank without a data-sized window: order-aligned score
    // buckets (Corpus.bucketedRankBy). Tie order inside a score is
    // arbitrary in EITHER formulation — only min+max per score group
    // feed the U statistic, and a tie group's rank range is
    // permutation-invariant.
    val ranked = Corpus.bucketedRankBy(base, "__s", Seq.empty)
      .withColumnRenamed("__rg", "__r")
      .withColumn("__rsum2",
        (min(col("__r")).over(Window.partitionBy(col("__s"))) +
          max(col("__r")).over(Window.partitionBy(col("__s")))))
    ranked.agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__y"), col("__rsum2")).otherwise(0L)).as("ranksum2"))
      .select(col("n_pos"), col("n_neg"),
        (col("ranksum2") - col("n_pos") * (col("n_pos") + 1L))
          .as("u2"),
        ((col("ranksum2") - col("n_pos") * (col("n_pos") + 1L))
          .cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  /** Time-window-constrained funnel at the USER grain — [[funnel]]'s
    * conversion-window extension: each stage must happen STRICTLY
    * after the previous stage's first reach AND within `windowMs` of
    * it (the "purchase within 7 days of click" product question —
    * without the window, a conversion two years later still counts).
    * Output is one row per stage-1 user with nullable millisecond
    * reach times t1..tn — the per-user detail a gate can hash (the
    * aggregate counts are one groupBy away). Each stage is a
    * user-keyed equi-join of the stage slice against the previous
    * reach frame (key-grain small side — AQE broadcasts it) with the
    * window as a residual predicate; never all-pairs.
    */
  def funnelWindowed(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], windowMs: Long): DataFrame = {
    require(stages.nonEmpty && windowMs > 0)
    val events = df.select(col(userCol).as("__u"),
      col(typeCol).as("__e"), unix_millis(col(tsCol)).as("__ms"))
    val reaches: Seq[DataFrame] =
      stages.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
        case (acc, (stage, i)) =>
          val slice = events.filter(col("__e") === stage)
          val eligible = acc.lastOption match {
            case None => slice
            case Some(prev) => slice
              .join(prev.select(col("__u"), col(s"t$i").as("__prev")),
                Seq("__u"))
              .filter(col("__ms") > col("__prev") &&
                col("__ms") <= col("__prev") + windowMs)
          }
          acc :+ eligible.groupBy(col("__u"))
            .agg(min(col("__ms")).as(s"t${i + 1}"))
      }
    reaches.reduceLeft((a, b) => a.join(b, Seq("__u"), "left"))
      .withColumnRenamed("__u", userCol)
  }

  /** Linear multi-touch attribution — every touch (ad view, click)
    * inside the lookback window before a conversion shares the
    * conversion's credit equally, the workhorse model between
    * last-touch (all credit to one event) and data-driven Shapley.
    * Credit is EXACT integer ppm: each of a conversion's n touches
    * gets 1000000 div n, and the division remainder goes to the most
    * recent touch (deterministic (ts, id) total order) so every
    * converted conversion contributes exactly 1 000 000 — the
    * invariant a finance-grade report reconciles against.
    *
    * Shape at 100 TB: touches⋈conversions is a USER-keyed equi-join
    * (never all-pairs) with the time bound as a join-residual
    * predicate; per-conversion fan-in is capped by touch rate ×
    * lookback, and the credit windows partition by conversion id —
    * group-bounded, spill-not-OOM. Returns one row per touch type:
    * (touch_type, n_touches, n_conversions, credit_ppm).
    */
  /** A/B experiment readout with DETERMINISTIC assignment: variant =
    * md5-hash(unit id) mod `variants` — the standard stateless bucket
    * function (no assignment table, any engine recomputes it), via
    * the cross-engine 60-bit md5 recipe. Conversion = the unit has
    * ≥ 1 `convType` event. Output per variant: exposed units,
    * converted units, conversion rate in exact integer ppm — the
    * readout reconciles because every unit lands in exactly one
    * bucket. One user-grain agg + one variant-grain agg; nothing
    * leaves the key shuffle.
    */
  def abLift(events: DataFrame, userCol: String, typeCol: String,
      convType: String, variants: Int): DataFrame = {
    require(variants > 0)
    val assigned = events
      .withColumn("variant",
        graft.expressions.Md5Hash60.hash60Native(
          col(userCol).cast("string")) % variants)
    val perUser = assigned.groupBy(col(userCol), col("variant"))
      .agg(max(when(col(typeCol) === convType, 1).otherwise(0))
        .as("__conv"))
    perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("__conv")).cast("long").as("n_converted"))
      .withColumn("conv_ppm",
        expr("(1000000 * n_converted) div n_users"))
  }

  def linearAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackHours: Int): DataFrame = {
    require(touchTypes.nonEmpty && lookbackHours > 0)
    val t = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(idCol).as("touch_id"),
        col(typeCol).as("touch_type"), col(tsCol).as("__tts"))
    val c = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("conv_id"),
        col(tsCol).as("__cts"))
    val joined = t.join(c, Seq("__u"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") > col("__cts") - expr(s"INTERVAL $lookbackHours HOURS"))
    val perConv = Window.partitionBy(col("conv_id"))
    val byRecency = Window.partitionBy(col("conv_id"))
      .orderBy(col("__tts").desc, col("touch_id").desc)
    joined
      .withColumn("__n", count(lit(1)).over(perConv))
      .withColumn("__credit",
        (lit(1000000L) / col("__n")).cast("long") +
          when(row_number().over(byRecency) === 1,
            lit(1000000L) % col("__n")).otherwise(lit(0L)))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("conv_id")).as("n_conversions"),
        sum(col("__credit")).as("credit_ppm"))
  }

  /** Benford's-law expected first-digit shares, ppm (⌊log₁₀(1+1/d)
    * ·10⁶⌋ — constants, so no log ever executes in the plan).
    */
  val BenfordPpm: Seq[Long] = Seq(301029L, 176091L, 124938L, 96910L,
    79181L, 66946L, 57991L, 51152L, 45757L)

  /** Benford first-digit audit — the accounting/fraud screen over a
    * positive amount column: observed first-significant-digit
    * distribution vs the Benford expectation, deviation per digit and
    * the mean-absolute-deviation rollup, all in EXACT integer ppm
    * (the expectations are pinned literals, the first digit comes
    * from the DECIMAL STRING of ⌊amount⌋ — integer-to-string is
    * unambiguous in every engine, unlike float formatting or a
    * log₁₀ power chain). One amount-scan partial agg to a ≤9-row
    * digit grid; rows with ⌊amount⌋ < 1 are excluded (no first
    * significant digit at integer precision).
    */
  /** "Top N + Other" — the BI presentation rollup: per group, the N
    * most frequent categories keep their identity, the tail
    * collapses into one `other` row, with exact ppm shares of the
    * group. Two key-partitioned aggs (category counts, then the
    * relabeled re-agg) + one group-bounded rank window — the fact
    * table is scanned once. Ordering ties break by category name so
    * the cut is deterministic.
    */
  def topNOther(df: DataFrame, grpCol: String, catCol: String,
      n: Int): DataFrame = {
    require(n >= 1)
    val counts = df.groupBy(col(grpCol), col(catCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(grpCol))
      .orderBy(col("cnt").desc, col(catCol))
    val wg = Window.partitionBy(col(grpCol))
    counts
      .withColumn("__rk", row_number().over(w))
      .withColumn("label",
        when(col("__rk") <= n, col(catCol)).otherwise(lit("other")))
      .groupBy(col(grpCol), col("label"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_cats"))
      .withColumn("share_ppm",
        expr(s"n_rows * 1000000L div sum(n_rows) OVER (PARTITION BY $grpCol)"))
      .withColumn("is_other", col("label") === "other")
  }

  /** Deterministic-bootstrap A/B lift CI: the [[abLift]] md5 arm
    * assignment plus [[graft.operators.Corpus.bootstrapMeanCI]]'s
    * md5-nibble Poisson weights, applied PER ARM in the same
    * aggregates — R resamples of mean(B) − mean(A) from ONE scan
    * (4R+4 paired aggregates, no explode, no shuffle). The CI bounds
    * are nearest-rank order statistics of the R integer-milli diffs;
    * a parametric z-interval would need sqrt and could never
    * hash-gate.
    */
  def abBootstrapDiff(df: DataFrame, idCol: String, valCol: String,
      replicates: Int, salt: String, loPct: Int = 5, hiPct: Int = 95)
      : DataFrame = {
    require(replicates >= 2 && loPct >= 0 && hiPct <= 100 && loPct < hiPct)
    val arm = graft.expressions.Md5Hash60.hash60Native(
      col(idCol).cast("string")) % 2
    def weight(r: Int): Column = {
      val nib = conv(substring(md5(
        concat_ws("#", col(idCol).cast("string"), lit(r.toString),
          lit(salt))), 1, 1), 16, 10).cast("long")
      when(nib < 6, 0L).when(nib < 12, 1L).when(nib < 15, 2L)
        .otherwise(3L)
    }
    val v = col(valCol).cast("long")
    val inA = (arm === 0).cast("long")
    val inB = (arm === 1).cast("long")
    val aggs = Seq(
      sum(inA).as("n_a"), sum(inB).as("n_b"),
      sum(v * inA).as("sx_a"), sum(v * inB).as("sx_b")) ++
      (0 until replicates).flatMap { r =>
        val wgt = weight(r)
        Seq(sum(wgt * inA).as(s"__wa_$r"),
          sum(wgt * v * inA).as(s"__wxa_$r"),
          sum(wgt * inB).as(s"__wb_$r"),
          sum(wgt * v * inB).as(s"__wxb_$r"))
      }
    // R md5 draws per row make the PARTIAL agg the CPU-dense part,
    // and it runs inside the scan stage — one task on an under-split
    // local source. Spread first (no-op at scale, guide §2.2); long
    // sums are exactly associative, so partition placement can't
    // change a bit.
    val one = Spread.byKey(df.select(col(idCol), col(valCol)), idCol)
      .agg(aggs.head, aggs.tail: _*)
    val diffs = array((0 until replicates).map { r =>
      expr(s"__wxb_$r * 1000L div greatest(__wb_$r, 1L) - " +
        s"__wxa_$r * 1000L div greatest(__wa_$r, 1L)")
    }: _*)
    val sorted = array_sort(diffs)
    val loRank = math.max(1, math.ceil(loPct * replicates / 100.0).toInt)
    val hiRank = math.max(1, math.ceil(hiPct * replicates / 100.0).toInt)
    one.select(col("n_a"), col("n_b"),
      expr("sx_a * 1000L div greatest(n_a, 1L)").as("mean_a_milli"),
      expr("sx_b * 1000L div greatest(n_b, 1L)").as("mean_b_milli"),
      expr("sx_b * 1000L div greatest(n_b, 1L) - " +
        "sx_a * 1000L div greatest(n_a, 1L)").as("point_diff_milli"),
      element_at(sorted, loRank).as("ci_lo_milli"),
      element_at(sorted, hiRank).as("ci_hi_milli"),
      aggregate(sorted, lit(0L), (acc, x) => acc + x)
        .as("sum_diffs_milli"))
  }

  def benfordAudit(df: DataFrame, amount: Column): DataFrame = {
    val v = floor(amount).cast("long")
    val digits = df.select(v.as("__v")).filter(col("__v") >= 1L)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val expected = array(BenfordPpm.map(lit): _*)
    val w = Window.partitionBy(lit(1))
    // dense 1..9 grid: an absent digit still owes its |0 − exp|
    // deviation, or MAD under-reports exactly when the data is most
    // anomalous
    val grid = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    grid.join(digits, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__total", greatest(sum(col("n")).over(w), lit(1L)))
      .withColumn("obs_ppm", expr("n * 1000000L div __total"))
      .withColumn("exp_ppm", element_at(expected, col("digit")))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      .withColumn("mad_ppm",
        expr("CAST(sum(dev_ppm) OVER (PARTITION BY 1) div 9 AS LONG)"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        col("dev_ppm"), col("mad_ppm"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic over an integral
    * measure — the distribution-drift gate that binned L1 drift
    * approximates: D = max_x |F_A(x) − F_B(x)|, computed in pure
    * integers by cross-multiplication (|C_A·n_B − C_B·n_A| in units
    * of 1/(n_A·n_B)) so the statistic hash-gates bit-exactly — no
    * float CDFs, no binning loss. Returns one row: (n_a, n_b, d_num,
    * d_ppm = d_num·1e6 div (n_a·n_b)).
    *
    * Shape: one value-keyed partial agg (output bounded by the value
    * DOMAIN — lengths, ppm scores — not the row count), then the
    * running CDFs over that domain-sized frame in one unpartitioned
    * window (acceptable for the same reason the q128 quantile frames
    * are: the window input is the distinct-value frame, never the
    * data); totals ride a 1-row broadcast. Contract: n_a·n_b must
    * fit i64 (holds to ~3·10⁹ rows per side).
    */
  def ksStatistic(df: DataFrame, isA: Column, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.FixedPoint.idiv
    val per = df
      .select(col(valCol).as("__v"),
        when(isA, 1L).otherwise(0L).as("__a"))
      .groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"),
        (count(lit(1)) - sum(col("__a"))).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = per
      .withColumn("__CA", sum(col("__ca")).over(w))
      .withColumn("__CB", sum(col("__cb")).over(w))
    val tot = per.agg(sum(col("__ca")).as("n_a"),
      sum(col("__cb")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(abs(col("__CA") * col("n_b") - col("__CB") * col("n_a")))
          .as("d_num"))
      .withColumn("d_ppm",
        idiv(col("d_num") * 1000000L, col("n_a") * col("n_b")))
  }
}
