package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series readouts over an event stream: time-range rolling
  * windows, period-over-period deltas, EWMA smoothing, and algebraic
  * re-aggregation of daily partials (the incremental-view-maintenance
  * identity). The reference's gold tables are re-read by exactly these
  * shapes downstream (reference: powerbi_main_fun.py gold consumers).
  *
  * Scale notes: every operator is one key-partitioned shuffle; window
  * frames are value-bounded (RANGE over epoch seconds) so WindowExec
  * holds only the frame, and the daily/weekly grids are
  * dimension-bounded. No self-joins, no driver state.
  */
object TimeSeries {

  /** Per-key rolling time window over the RAW event grain: for each
    * event, the count and sum of `valCol` over [t - windowSec, t]
    * (inclusive both ends — RANGE frame peers included identically on
    * every engine). Epoch SECONDS (floored) are the frame currency:
    * integer-valued, so the frame bound is exact — a fractional-second
    * RANGE bound invites float drift between engines.
    *
    * One shuffle+sort on (key, sec); the frame is time-bounded so
    * state is O(events-per-window), and WindowExec spills rather than
    * OOMs on a hot key. The sum runs over DECIMAL (raw-double window
    * sums are partition-order-dependent).
    */
  def rollingWindow(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, valCol: String, windowSec: Long): DataFrame = {
    require(windowSec > 0)
    val base = df.select(col(keyCol), col(idCol),
      unix_timestamp(col(tsCol)).as("sec"),
      col(valCol).cast("decimal(18,6)").as("__v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("sec"))
      .rangeBetween(-windowSec, 0)
    base.select(col(keyCol), col(idCol), col("sec"),
      count(lit(1)).over(w).as("n_win"),
      sum(col("__v")).over(w).cast("double").as("sum_win"))
  }

  /** Daily per-key counts. The shared head of the lag/EWMA/rollup
    * readouts: one partial agg to a (key, day) grid — dimension-
    * bounded, never event-grained.
    */
  private def dailyCounts(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame =
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))

  /** Period-over-period: each day's count vs the PREVIOUS OBSERVED
    * day (lag over the daily grid — gap days are not materialized;
    * compose with Analytics.gapFillDaily when calendar-adjacent
    * deltas are wanted). First observation: null prev/delta/ratio.
    * The ratio divides two exact longs in double space — one IEEE op,
    * engine-stable.
    */
  def periodOverPeriod(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    dailyCounts(df, keyCol, tsCol)
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - col("prev_n"))
      .withColumn("ratio",
        col("n").cast("double") / col("prev_n").cast("double"))
  }

  /** Volume-spike anomaly flags over the daily grid: a day is a
    * spike when its count exceeds `numerPct`% of its trailing
    * `lookback`-observation baseline mean — evaluated in EXACT
    * integer cross-multiplied form (100·lookback·n > pct·trailing
    * sum), so the gate never touches a float and the same rule runs
    * identically in any engine. The baseline is the previous
    * `lookback` OBSERVED days (ROWS frame excluding the current
    * day); warm-up days with fewer than `lookback` observations are
    * reported unflagged with their partial window size — the
    * downstream pager decides what to do with cold keys. One keyed
    * window over the dimension-bounded (key, day) grid; at 100 TB
    * the grid, not the event stream, pays the sort.
    */
  def dailySpikes(df: DataFrame, keyCol: String, tsCol: String,
      lookback: Int, numerPct: Int): DataFrame =
    spikesFromDailyGrid(dailyCounts(df, keyCol, tsCol), keyCol,
      lookback, numerPct)

  /** The spike rule over an ALREADY-AGGREGATED (key, day, n) grid —
    * the readout half of [[dailySpikes]], factored out so a
    * streaming-maintained grid (Complete-mode daily counts, q60's
    * state) feeds the identical alert logic (q240): batch and stream
    * alerting cannot drift because they are one definition.
    */
  def spikesFromDailyGrid(grid: DataFrame, keyCol: String,
      lookback: Int, numerPct: Int): DataFrame = {
    require(lookback > 0 && numerPct > 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    grid
      .withColumn("n_baseline", count(lit(1)).over(w))
      .withColumn("baseline_sum",
        coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("is_spike",
        col("n_baseline") === lookback &&
          col("n") * 100L * lookback > col("baseline_sum") * numerPct)
  }

  /** EWMA of the daily count per key, folded in day order:
    * ewma₁ = n₁; ewmaᵢ = α·nᵢ + (1-α)·ewmaᵢ₋₁. The fold is SEQUENTIAL
    * (higher-order `aggregate` over a sorted day array), so the
    * float result is bit-stable regardless of partitioning — the one
    * double formulation a hash gate can hold exactly (a window-based
    * running form would be partition-order-safe too, but Spark has no
    * recursive window; the array fold is the declarative spelling).
    * The array is days-per-key long — calendar-bounded, not
    * event-bounded. α must be exactly representable (0.25, 0.5) or
    * the gate compares engine decimal-parsing, not math.
    */
  def ewmaDaily(df: DataFrame, keyCol: String, tsCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1)
    val a = lit(alpha)
    val vals = array_sort(collect_list(struct(col("day"), col("n"))))
    dailyCounts(df, keyCol, tsCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), vals.as("__arr"))
      .select(col(keyCol), col("n_days"),
        aggregate(
          slice(transform(col("__arr"), x => x("n").cast("double")),
            lit(2), size(col("__arr")) - 1),
          element_at(col("__arr"), 1)("n").cast("double"),
          (acc, x) => a * x + (lit(1.0) - a) * acc).as("ewma"))
  }

  /** The persisted daily-partial grain shared by [[weeklyFromDailyPartials]]
    * and [[upsertDailyPartials]]: algebraic sufficient statistics
    * (count / min / max / DECIMAL sum) at (key, day) — every readout
    * above this grain merges without re-touching facts. Sums stay
    * DECIMAL until the caller's final cast (decimal addition is
    * associative; double addition is not).
    */
  def dailyPartials(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        min(unix_timestamp(col(tsCol))).as("tmin"),
        max(unix_timestamp(col(tsCol))).as("tmax"),
        sum(col(valCol).cast("decimal(18,6)")).as("v"))

  /** Algebraic re-aggregation: weekly rollups derived from DAILY
    * PARTIALS, never re-touching the fact table — sum-of-sums,
    * min-of-mins, max-of-maxes, count-of-counts. At 100 TB this is
    * the incremental-maintenance identity: the daily grid is the
    * persisted gold table and each new day merges in O(grid), while
    * the oracle recomputes the week straight from the facts — a green
    * gate IS the proof the merge loses nothing.
    */
  def weeklyFromDailyPartials(df: DataFrame, keyCol: String,
      tsCol: String, valCol: String): DataFrame = {
    val daily = dailyPartials(df, keyCol, tsCol, valCol)
    daily
      .groupBy(col(keyCol),
        to_date(date_trunc("week", col("day"))).as("week"))
      .agg(sum(col("n")).as("n"),
        min(col("tmin")).as("tmin"), max(col("tmax")).as("tmax"),
        sum(col("v")).cast("double").as("sum_value"))
  }

  /** Day-of-week seasonal profile: each day's count vs the mean of
    * ALL observed same-weekday days for its key (current day
    * included — this is the full-period seasonal baseline, not a
    * trailing one; compose with [[spikesFromDailyGrid]] for trailing
    * alerts). The ratio is exact integer ppm by cross-multiplication:
    * ratio = n / (dow_sum/n_dow_days) → 1e6·n·n_dow_days div dow_sum
    * — no float mean anywhere, so the whole profile hash-gates.
    * Weekday currency: Spark `weekday` (0=Mon..6=Sun) ≡ DuckDB
    * `isodow − 1`. Two windows over the same (key, dow) partition —
    * one keyed shuffle over the dimension-bounded daily grid.
    */
  def dowBaselineDeviation(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val grid = dailyCounts(df, keyCol, tsCol)
      .withColumn("dow", weekday(col("day")).cast("int"))
    val w = Window.partitionBy(col(keyCol), col("dow"))
    grid
      .withColumn("n_dow_days", count(lit(1)).over(w))
      .withColumn("dow_sum", sum(col("n")).over(w))
      .withColumn("ratio_ppm",
        expr("(1000000 * n * n_dow_days) div dow_sum"))
      .select(col(keyCol), col("day"), col("dow"), col("n"),
        col("n_dow_days"), col("dow_sum"), col("ratio_ppm"))
  }

  /** CUSUM changepoint scan over the daily grid: the cumulative
    * deviation of each prefix from the key's overall mean rate, in
    * EXACT integers — dev_i = D·S_i − i·T (D days, T total events,
    * S_i prefix sum at day i) is 86400·D× the classic CUSUM statistic
    * with the float mean cleared by cross-multiplication. The day
    * maximizing |dev| is the single most likely level-shift point
    * (the classic binary-segmentation pivot); `is_peak` marks it
    * (ties → earliest day). One keyed shuffle; the prefix and
    * whole-partition windows share the sort.
    */
  def cusumChangepoint(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val grid = dailyCounts(df, keyCol, tsCol)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val wAll = Window.partitionBy(col(keyCol))
    val scored = grid
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("d_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("dev",
        col("d_days") * col("cum") - col("i") * col("total"))
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(abs(col("dev")).desc, col("day"))))
      .withColumn("is_peak", col("__rk") === 1)
      .select(col(keyCol), col("day"), col("i"), col("n"), col("cum"),
        col("dev"), col("is_peak"))
  }

  /** Robust outlier days by median/MAD — the heavy-tail-safe
    * alternative to [[dailySpikes]]' trailing mean (one wild day
    * cannot drag the baseline, because medians are selected, not
    * summed): a day is an outlier when |n − median| > mult·MAD, all
    * in EXACT integers — medians are nearest-rank SELECTED values on
    * a (value, day) total order (rank ⌈D/2⌉, the q128 discipline),
    * absolute deviations are integer, and the flag is an integer
    * comparison. Degenerate MAD = 0 (over half the days identical)
    * flags any deviation — the standard behavior, stated here so it
    * is a contract, not a surprise. One keyed shuffle; all four
    * window passes share the (key) partitioning.
    */
  def robustOutliers(df: DataFrame, keyCol: String, tsCol: String,
      madMult: Int): DataFrame = {
    require(madMult >= 1)
    val grid = dailyCounts(df, keyCol, tsCol)
    val wKey = Window.partitionBy(col(keyCol))
    val byN = wKey.orderBy(col("n"), col("day"))
    val withMed = grid
      .withColumn("__rn", row_number().over(byN))
      .withColumn("__d", count(lit(1)).over(wKey))
      .withColumn("med", max(when(
        col("__rn") === expr("(__d + 1) div 2"), col("n"))).over(wKey))
      .withColumn("absdev", abs(col("n") - col("med")))
    val byDev = wKey.orderBy(col("absdev"), col("day"))
    withMed
      .withColumn("__rn2", row_number().over(byDev))
      .withColumn("mad", max(when(
        col("__rn2") === expr("(__d + 1) div 2"), col("absdev"))).over(wKey))
      .withColumn("is_outlier", col("absdev") > col("mad") * madMult)
      .select(col(keyCol), col("day"), col("n"), col("med"),
        col("absdev"), col("mad"), col("is_outlier"))
  }

  /** EXACT rolling distinct actives (the 7-day-rolling DAU/WAU
    * readout): a user counts in window-ending-day w when they have
    * ANY event in [w − span + 1, w]. Distinct-over-a-sliding-window
    * does NOT decompose into per-day partials (yesterday's distinct
    * set overlaps today's), so the exact form expands each observed
    * (key, user, day) to the `span` window-days it covers — a
    * bounded ×span explode at the USER-DAY grain (already deduped,
    * far below event grain) — then counts distinct per (key, window
    * day). Only windows ending on OBSERVED days are emitted. At
    * larger spans (MAU = 30) the explode factor grows linearly —
    * [[Sketch.hllRegistersBy]] + register window-max is the sketch
    * path (q266's shape).
    */
  def rollingDistinct(df: DataFrame, keyCol: String, tsCol: String,
      userCol: String, spanDays: Int): DataFrame = {
    require(spanDays >= 1)
    val userDays = df
      .filter(col(userCol).isNotNull)
      .select(col(keyCol), col(userCol).as("__user"),
        to_date(col(tsCol)).as("__day"))
      .distinct()
    val observedDays = userDays.select(col(keyCol), col("__day")).distinct()
    val covered = userDays
      .select(col(keyCol), col("__user"), col("__day"),
        explode(sequence(lit(0), lit(spanDays - 1))).as("__off"))
      .select(col(keyCol), col("__user"),
        expr(s"date_add(__day, __off)").as("__day"))
    covered.join(observedDays, Seq(keyCol, "__day"), "left_semi")
      .groupBy(col(keyCol), col("__day").as("window_end"))
      .agg(countDistinct(col("__user")).as("n_active"))
  }

  /** Incremental view maintenance with LATE DATA: merge a
    * late-arriving fact batch into an existing [[dailyPartials]] gold
    * table, recomputing ONLY the touched (key, day) cells — the
    * untouched grid passes through by anti-join, never re-aggregated.
    * At 100 TB this is the difference between "a day of stragglers
    * reprocesses the world" and "a day of stragglers costs one
    * batch-sized agg + a grid-keyed join": the fact table is never
    * re-read. Merge algebra = sum/min/max/DECIMAL-sum of partials
    * (associative — the q200 identity), so
    * upsert(partials(A), B) ≡ partials(A ∪ B) EXACTLY, which is the
    * oracle gate.
    */
  def upsertDailyPartials(partials: DataFrame, lateFacts: DataFrame,
      keyCol: String, tsCol: String, valCol: String): DataFrame = {
    val lateDaily = dailyPartials(lateFacts, keyCol, tsCol, valCol)
    val touchedKeys = lateDaily.select(col(keyCol), col("day"))
    val untouched = partials.join(touchedKeys, Seq(keyCol, "day"),
      "left_anti")
    val merged = partials.join(touchedKeys, Seq(keyCol, "day"),
        "left_semi")
      .unionByName(lateDaily)
      .groupBy(col(keyCol), col("day"))
      .agg(sum(col("n")).as("n"),
        min(col("tmin")).as("tmin"), max(col("tmax")).as("tmax"),
        sum(col("v")).cast("decimal(18,6)").as("v"))
    untouched.unionByName(merged)
  }

  /** Holt double-exponential smoothing (level + linear trend) of the
    * daily count per key, folded in day order with the q197
    * sequential-fold discipline: l₁ = n₁, b₁ = 0;
    * lᵢ = α·nᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁), bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁.
    * The fold is SEQUENTIAL over the sorted day array, so the double
    * chain is bit-stable under any partitioning and the h-step
    * forecast level + h·trend hash-gates exactly. α/β must be
    * exactly representable (0.5, 0.25). Array length = days-per-key
    * (calendar-bounded); single-day keys fall out naturally as
    * (level = n₁, trend = 0).
    */
  def holtDaily(df: DataFrame, keyCol: String, tsCol: String,
      alpha: Double, beta: Double, horizon: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 && horizon >= 0)
    val a = lit(alpha)
    val b = lit(beta)
    val vals = array_sort(collect_list(struct(col("day"), col("n"))))
    dailyCounts(df, keyCol, tsCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), vals.as("__arr"))
      .select(col(keyCol), col("n_days"),
        aggregate(
          slice(transform(col("__arr"), x => x("n").cast("double")),
            lit(2), size(col("__arr")) - 1),
          struct(element_at(col("__arr"), 1)("n").cast("double").as("l"),
            lit(0.0).as("b")),
          (acc, x) => {
            // the new level expression appears in both fields — IEEE
            // evaluation of the identical expression is deterministic,
            // so the duplication is bit-safe (and DuckDB replays it
            // the same way)
            val nl = a * x + (lit(1.0) - a) * (acc("l") + acc("b"))
            struct(nl.as("l"),
              (b * (nl - acc("l")) + (lit(1.0) - b) * acc("b")).as("b"))
          }).as("__st"))
      .select(col(keyCol), col("n_days"),
        col("__st")("l").as("level"), col("__st")("b").as("trend"),
        (col("__st")("l") + lit(horizon.toDouble) * col("__st")("b"))
          .as("forecast"))
  }

  /** Forecast-model backtest over the daily grid: one-step-ahead
    * NAIVE (yesterday's observed count) vs SEASONAL-NAIVE (the count
    * 7 observations back) forecasts, scored by mean absolute error
    * on the days where BOTH are defined (observation index ≥ 8 per
    * key). All-integer: the errors are |n − lag(n)| sums and the MAE
    * comparison picks the winner by cross-multiplied sums (never a
    * float mean), so model selection hash-gates. Lags are over
    * OBSERVED days (the grid), not calendar days — compose with
    * gapFillDaily first when the series has holes and calendar lags
    * are wanted. One keyed window sort over the dimension-bounded
    * grid.
    */
  def backtestNaive(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    dailyCounts(df, keyCol, tsCol)
      .withColumn("f_naive", lag(col("n"), 1).over(w))
      .withColumn("f_snaive", lag(col("n"), 7).over(w))
      .filter(col("f_snaive").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("n") - col("f_naive"))).as("ae_naive"),
        sum(abs(col("n") - col("f_snaive"))).as("ae_snaive"))
      .withColumn("winner",
        when(col("ae_naive") <= col("ae_snaive"), lit("naive"))
          .otherwise(lit("seasonal_naive")))
  }
}
