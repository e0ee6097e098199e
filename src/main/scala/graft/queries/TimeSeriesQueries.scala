package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Sketch, TimeSeries}

/** q195–q200: time-series readouts and per-group quantiles — rolling
  * time-range windows, period-over-period, EWMA, exact + histogram
  * quantiles, and weekly-from-daily-partials re-aggregation.
  *
  * Float discipline: every gated double is either a DECIMAL sum cast
  * once at the end, a single long/long IEEE division, a sequential
  * array fold, or a selected existing value — no reassociated double
  * arithmetic (see .claude/skills/verify/SKILL.md).
  */
object TimeSeriesQueries extends QueryPack {

  def defs: Map[String, Q] = Map(

    // Volume-spike anomaly flags: a day is a spike when its event
    // count exceeds 150% of its trailing 7-observed-day mean — in
    // exact cross-multiplied integers (100·7·n > 150·sum), no floats
    // anywhere, so the full flag table hash-gates. Warm-up days
    // (fewer than 7 prior observations) surface unflagged.
    "q236_daily_spikes" -> Q(
      (s, dir) => TimeSeries.dailySpikes(
          Tables.events(s, dir), "event_type", "ts",
          lookback = 7, numerPct = 150)
        .orderBy(col("event_type"), col("day")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    count(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_baseline,
        |    coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS baseline_sum
        |  FROM d)
        |SELECT event_type, day, n,
        |  CAST(n_baseline AS BIGINT) AS n_baseline,
        |  CAST(baseline_sum AS BIGINT) AS baseline_sum,
        |  n_baseline = 7 AND n * 100 * 7 > baseline_sum * 150 AS is_spike
        |FROM w
        |ORDER BY event_type, day""".stripMargin)),

    // Rolling 7-day count+sum per user at the event grain. RANGE
    // frame over floored epoch seconds (integer currency — exact
    // frame bounds on both engines); sum rides DECIMAL.
    "q195_rolling_window" -> Q(
      (s, dir) => TimeSeries.rollingWindow(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "event_id", "ts", "value", 604800L)
        .orderBy(col("user_id"), col("event_id")),
      Some("""WITH b AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, event_id, sec,
        |  count(*) OVER w AS n_win,
        |  CAST(sum(v) OVER w AS DOUBLE) AS sum_win
        |FROM b
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)),

    // Day-over-day deltas per event_type vs the previous OBSERVED
    // day. ratio = one long/long IEEE division — engine-stable.
    "q196_period_over_period" -> Q(
      (s, dir) => TimeSeries.periodOverPeriod(
          Tables.events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("day")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, day, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day)
        |      AS prev_n
        |  FROM d)
        |SELECT event_type, day, n, prev_n,
        |  n - prev_n AS delta,
        |  CAST(n AS DOUBLE) / CAST(prev_n AS DOUBLE) AS ratio
        |FROM l
        |ORDER BY event_type, day""".stripMargin)),

    // EWMA (α=0.25) of daily counts per event_type: a SEQUENTIAL
    // day-ordered fold (Spark higher-order aggregate ≡ DuckDB
    // list_reduce) — bit-stable under any partitioning, raw double
    // out (never round a gated double).
    "q197_ewma" -> Q(
      (s, dir) => TimeSeries.ewmaDaily(
          Tables.events(s, dir), "event_type", "ts", 0.25)
        .orderBy(col("event_type")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_days,
        |  list_reduce(list(CAST(n AS DOUBLE) ORDER BY day),
        |    (acc, x) -> 0.25*x + 0.75*acc) AS ewma
        |FROM d GROUP BY 1
        |ORDER BY event_type""".stripMargin)),

    // Exact per-group quantiles of a DOUBLE measure (order prices) —
    // Corpus.exactQuantiles (already gated on integer token lengths
    // in q128) exercised on the BI fact grain: full per-group sort +
    // ceil(p·n) rank pick; output values are SELECTED, never
    // interpolated, so the hash gate compares selection, not float
    // formulas. The baseline half of the pair (q199 is the scale
    // path).
    "q198_exact_quantiles" -> Q(
      (s, dir) => Corpus.exactQuantiles(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          "o_orderkey", Seq(0.5, 0.9, 0.99))
        .orderBy(col("o_orderpriority")),
      Some("""WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_docs,
        |  max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
        |      THEN o_totalprice END) AS q_50,
        |  max(CASE WHEN rn = CAST(ceil(0.9*n) AS BIGINT)
        |      THEN o_totalprice END) AS q_90,
        |  max(CASE WHEN rn = CAST(ceil(0.99*n) AS BIGINT)
        |      THEN o_totalprice END) AS q_99
        |FROM r GROUP BY 1
        |ORDER BY 1""".stripMargin)),

    // Histogram-sketch quantiles: ONE partial agg to a (group × bin)
    // grid replaces the fact-grain sort; estimate = upper edge of
    // the first bin reaching ceil(p·n) cumulative count (error
    // ≤ binWidth by construction).
    "q199_histogram_quantiles" -> Q(
      (s, dir) => Corpus.histogramQuantiles(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          10000.0, Seq(0.5, 0.9, 0.99))
        .orderBy(col("o_orderpriority")),
      Some("""WITH g AS (
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS bin,
        |    count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o_orderpriority, bin, c,
        |    CAST(sum(c) OVER (PARTITION BY o_orderpriority
        |      ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY o_orderpriority)
        |      AS BIGINT) AS n
        |  FROM g)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_docs,
        |  min(CASE WHEN cum >= CAST(ceil(0.5*n) AS BIGINT)
        |      THEN CAST(bin + 1 AS DOUBLE) * 10000.0 END) AS q_50_est,
        |  min(CASE WHEN cum >= CAST(ceil(0.9*n) AS BIGINT)
        |      THEN CAST(bin + 1 AS DOUBLE) * 10000.0 END) AS q_90_est,
        |  min(CASE WHEN cum >= CAST(ceil(0.99*n) AS BIGINT)
        |      THEN CAST(bin + 1 AS DOUBLE) * 10000.0 END) AS q_99_est
        |FROM m GROUP BY 1
        |ORDER BY 1""".stripMargin)),

    // Weekly rollups merged from DAILY PARTIALS (sum-of-sums,
    // min-of-mins, count-of-counts) while the oracle recomputes the
    // week straight from the facts — the green gate proves the
    // incremental-maintenance identity.
    "q200_rollup_maintenance" -> Q(
      (s, dir) => TimeSeries.weeklyFromDailyPartials(
          Tables.events(s, dir), "event_type", "ts", "value")
        .orderBy(col("event_type"), col("week")),
      Some("""SELECT event_type,
        |  date_trunc('week', CAST(ts AS DATE)) AS week,
        |  count(*) AS n,
        |  CAST(min(floor(epoch(ts))) AS BIGINT) AS tmin,
        |  CAST(max(floor(epoch(ts))) AS BIGINT) AS tmax,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // Day-of-week seasonal profile: each day vs the mean of all
    // same-weekday days for its event_type — ratio in exact
    // cross-multiplied ppm (1e6·n·n_dow_days div dow_sum), no float
    // mean. weekday(): Spark 0=Mon..6=Sun ≡ DuckDB isodow−1.
    "q245_dow_baseline" -> Q(
      (s, dir) => TimeSeries.dowBaselineDeviation(
          Tables.events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("day")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day,
        |    CAST(isodow(day) - 1 AS INT) AS dow, n,
        |    count(*) OVER (PARTITION BY event_type, isodow(day))
        |      AS n_dow_days,
        |    CAST(sum(n) OVER (PARTITION BY event_type, isodow(day))
        |      AS BIGINT) AS dow_sum
        |  FROM d)
        |SELECT event_type, day, dow, n,
        |  CAST(n_dow_days AS BIGINT) AS n_dow_days, dow_sum,
        |  (1000000 * n * n_dow_days) // dow_sum AS ratio_ppm
        |FROM w
        |ORDER BY event_type, day""".stripMargin)),

    // CUSUM changepoint scan: cumulative deviation from the per-key
    // mean rate in exact integers (dev_i = D·S_i − i·T), peak |dev|
    // marks the most likely level shift. All-integer gate.
    "q246_cusum_changepoint" -> Q(
      (s, dir) => TimeSeries.cusumChangepoint(
          Tables.events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("day")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS i,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS d_days,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS total
        |  FROM d),
        |s AS (
        |  SELECT event_type, day, i, n, cum,
        |    d_days * cum - i * total AS dev
        |  FROM w),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(dev) DESC, day) AS rk
        |  FROM s)
        |SELECT event_type, day, i, n, cum, dev, rk = 1 AS is_peak
        |FROM r
        |ORDER BY event_type, day""".stripMargin)),

    // Incremental view maintenance with late data: a straggler batch
    // (event_id % 7 = 0) merges into the daily-partials gold table
    // touching ONLY its (key, day) cells, while the oracle aggregates
    // ALL events directly — the green hash proves
    // upsert(partials(base), late) ≡ partials(base ∪ late) exactly
    // (DECIMAL sums re-associate losslessly; the q200 identity under
    // mutation).
    "q247_late_data_upsert" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val isLate = col("event_id") % 7 === 0
        val partials = TimeSeries.dailyPartials(
          ev.filter(!isLate), "event_type", "ts", "value")
        TimeSeries.upsertDailyPartials(partials, ev.filter(isLate),
            "event_type", "ts", "value")
          .select(col("event_type"), col("day"), col("n"), col("tmin"),
            col("tmax"), col("v").cast("double").as("sum_value"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |  CAST(min(floor(epoch(ts))) AS BIGINT) AS tmin,
        |  CAST(max(floor(epoch(ts))) AS BIGINT) AS tmax,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // Robust outlier days by median/MAD in EXACT integers: medians
    // are nearest-rank SELECTED values (rank ⌈D/2⌉ on a (value, day)
    // total order — the q128 discipline), deviations integer, flag a
    // plain comparison |n − med| > 3·MAD. Heavy-tail-safe where the
    // q236 trailing mean is not.
    "q252_robust_outliers" -> Q(
      (s, dir) => TimeSeries.robustOutliers(
          Tables.events(s, dir), "event_type", "ts", madMult = 3)
        .orderBy(col("event_type"), col("day")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r1 AS (
        |  SELECT event_type, day, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY n, day) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS dd
        |  FROM d),
        |m1 AS (
        |  SELECT *, max(CASE WHEN rn = (dd + 1) // 2 THEN n END)
        |      OVER (PARTITION BY event_type) AS med
        |  FROM r1),
        |a AS (SELECT event_type, day, n, dd, med,
        |        abs(n - med) AS absdev FROM m1),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY absdev, day) AS rn2
        |  FROM a),
        |m2 AS (
        |  SELECT *, max(CASE WHEN rn2 = (dd + 1) // 2 THEN absdev END)
        |      OVER (PARTITION BY event_type) AS mad
        |  FROM r2)
        |SELECT event_type, day, n, med, absdev, mad,
        |  absdev > mad * 3 AS is_outlier
        |FROM m2
        |ORDER BY event_type, day""".stripMargin)),

    // Winsorization at exact per-type p05/p95 fences: every output
    // value is a SELECTED input value (nearest-rank fences + pure
    // comparison clip), so the double column hash-gates.
    "q261_winsorize" -> Q(
      (s, dir) => Corpus.winsorize(
          Tables.events(s, dir).select(col("event_type"),
            col("event_id"), col("value")),
          "event_type", "value", "event_id", loP = 0.05, hiP = 0.95)
        .orderBy(col("event_id")),
      Some("""WITH r AS (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rnk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |f AS (
        |  SELECT event_type,
        |    max(CASE WHEN rnk = CAST(ceil(0.05 * n) AS BIGINT)
        |        THEN value END) AS fence_lo,
        |    max(CASE WHEN rnk = CAST(ceil(0.95 * n) AS BIGINT)
        |        THEN value END) AS fence_hi
        |  FROM r GROUP BY 1)
        |SELECT e.event_type, e.event_id, e.value, f.fence_lo,
        |  f.fence_hi,
        |  CASE WHEN e.value < f.fence_lo THEN f.fence_lo
        |       WHEN e.value > f.fence_hi THEN f.fence_hi
        |       ELSE e.value END AS winsorized,
        |  e.value < f.fence_lo OR e.value > f.fence_hi AS is_clipped
        |FROM events e JOIN f USING (event_type)
        |ORDER BY e.event_id""".stripMargin)),

    // Inter-arrival time distribution per event_type: millisecond
    // gaps between consecutive events (lag over one keyed sort),
    // summarized by exact nearest-rank p50/p90 — the burstiness
    // readout behind capacity planning and anomaly thresholds. Gaps
    // and quantiles are all exact integers.
    "q262_interarrival" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ms"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(w))
          .filter(col("gap_ms").isNotNull)
        Corpus.exactQuantiles(gaps, "event_type", "gap_ms",
            "event_id", Seq(0.5, 0.9))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (
        |  SELECT event_type, event_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
        |      PARTITION BY event_type ORDER BY epoch_ms(ts), event_id)
        |      AS gap_ms
        |  FROM events),
        |r AS (
        |  SELECT event_type, gap_ms,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY gap_ms, event_id) AS rnk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM g WHERE gap_ms IS NOT NULL)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_docs,
        |  max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
        |      THEN gap_ms END) AS q_50,
        |  max(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT)
        |      THEN gap_ms END) AS q_90
        |FROM r GROUP BY 1
        |ORDER BY event_type""".stripMargin)),

    // EXACT 7-day rolling distinct actives (rolling WAU): each
    // (key, user, day) covers the 7 windows it belongs to; windows
    // ending on observed days count their distinct users. The
    // distinct-over-sliding-window has no per-day decomposition —
    // this is the exact path, q266 the mergeable-sketch path.
    "q265_rolling_distinct" -> Q(
      (s, dir) => TimeSeries.rollingDistinct(
          Tables.events(s, dir), "event_type", "ts", "user_id",
          spanDays = 7)
        .orderBy(col("event_type"), col("window_end")),
      Some("""WITH ud AS (
        |  SELECT DISTINCT event_type, user_id,
        |    CAST(ts AS DATE) AS day
        |  FROM events WHERE user_id IS NOT NULL),
        |obs AS (SELECT DISTINCT event_type, day FROM ud),
        |cov AS (
        |  SELECT event_type, user_id,
        |    CAST(day + INTERVAL (off) DAY AS DATE) AS day
        |  FROM ud CROSS JOIN
        |    (SELECT unnest(generate_series(0, 6)) AS off))
        |SELECT c.event_type, c.day AS window_end,
        |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active
        |FROM cov c JOIN obs o
        |  ON o.event_type = c.event_type AND o.day = c.day
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // The SAME rolling-distinct readout as mergeable HLL registers:
    // per-day register tables expand to their 7 windows and MAX-merge
    // — the explode rides the groups × m sketch grain, never users.
    // Registers are exact integers, so the rolling sketch table
    // hash-gates even though its estimate is approximate.
    "q266_rolling_hll" -> Q(
      (s, dir) => Sketch.hllRollingRegistersBy(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          col("event_type"), to_date(col("ts")),
          concat(lit("u"), col("user_id")), m = 32, spanDays = 7)
        .orderBy(col("grp"), col("window_end"), col("idx")),
      Some("""WITH k AS (
        |  SELECT event_type AS grp, CAST(ts AS DATE) AS day,
        |    CAST(('0x' || substr(md5('u' || user_id), 1, 15))
        |      AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |rk AS (
        |  SELECT grp, day, h % 32 AS idx,
        |    CASE WHEN (h >> 5) = 0 THEN 56
        |         ELSE 56 - length(bin(h >> 5)) END AS rank
        |  FROM k),
        |daily AS (
        |  SELECT grp, day, idx, max(rank) AS rank
        |  FROM rk GROUP BY 1, 2, 3),
        |obs AS (SELECT DISTINCT grp, day FROM daily),
        |cov AS (
        |  SELECT grp, idx, rank,
        |    CAST(day + INTERVAL (off) DAY AS DATE) AS day
        |  FROM daily CROSS JOIN
        |    (SELECT unnest(generate_series(0, 6)) AS off))
        |SELECT c.grp, c.day AS window_end, c.idx,
        |  CAST(max(c.rank) AS INT) AS max_rank
        |FROM cov c JOIN obs o ON o.grp = c.grp AND o.day = c.day
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)),

    // Holt level+trend smoothing: the q197 sequential-fold discipline
    // with a struct accumulator — both engines replay the identical
    // IEEE chain over the day-sorted counts, so level/trend/forecast
    // hash-gate as raw doubles. The oracle replays the recurrence as
    // a RECURSIVE CTE over the per-key day index — NOT list_reduce:
    // DuckDB 1.0.0's lambda batcher mis-evaluates a struct
    // accumulator whose fields reference acc more than once (sibling
    // of the ELSE-acc bug pinned in q254).
    "q285_holt" -> Q(
      (s, dir) => TimeSeries.holtDaily(
          Tables.events(s, dir), "event_type", "ts",
          alpha = 0.5, beta = 0.25, horizon = 7)
        .orderBy(col("event_type")),
      Some("""WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, CAST(n AS DOUBLE) AS x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS i,
        |    count(*) OVER (PARTITION BY event_type) AS n_days
        |  FROM d),
        |rec AS (
        |  SELECT event_type, i, n_days, x AS l, CAST(0.0 AS DOUBLE)
        |    AS b
        |  FROM s WHERE i = 1
        |  UNION ALL
        |  SELECT s.event_type, s.i, s.n_days,
        |    0.5*s.x + 0.5*(rec.l + rec.b),
        |    0.25*((0.5*s.x + 0.5*(rec.l + rec.b)) - rec.l)
        |      + 0.75*rec.b
        |  FROM rec JOIN s ON s.event_type = rec.event_type
        |                 AND s.i = rec.i + 1)
        |SELECT event_type, n_days, l AS level, b AS trend,
        |  l + 7.0*b AS forecast
        |FROM rec WHERE i = n_days
        |ORDER BY event_type""".stripMargin)),

    // Naive vs seasonal-naive backtest: all-integer MAE sums over
    // observed-day lags; the winner verdict needs no division at
    // equal n_scored (compare the sums directly).
    "q286_backtest" -> Q(
      (s, dir) => TimeSeries.backtestNaive(
          Tables.events(s, dir), "event_type", "ts")
        .orderBy(col("event_type")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day)
        |      AS f_naive,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day)
        |      AS f_snaive
        |  FROM d)
        |SELECT event_type, count(*) AS n_scored,
        |  CAST(sum(abs(n - f_naive)) AS BIGINT) AS ae_naive,
        |  CAST(sum(abs(n - f_snaive)) AS BIGINT) AS ae_snaive,
        |  CASE WHEN sum(abs(n - f_naive)) <= sum(abs(n - f_snaive))
        |    THEN 'naive' ELSE 'seasonal_naive' END AS winner
        |FROM l WHERE f_snaive IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin))
  )
}
