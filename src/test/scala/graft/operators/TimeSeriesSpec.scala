package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("rollingWindow counts/sums events within the trailing range, inclusive") {
    import spark.implicits._
    // 10s window: events at t=0, 5, 10 (all within 10 of t=10), t=21 (alone)
    val df = Seq(
      (1L, 101L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 102L, ts("2024-01-01 00:00:05"), 2.0),
      (1L, 103L, ts("2024-01-01 00:00:10"), 4.0),
      (1L, 104L, ts("2024-01-01 00:00:21"), 8.0),
      (2L, 201L, ts("2024-01-01 00:00:07"), 16.0)
    ).toDF("k", "id", "ts", "v")
    val got = TimeSeries.rollingWindow(df, "k", "id", "ts", "v", 10L)
      .orderBy("k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 101L, 1L, 1.0),
      (1L, 102L, 2L, 3.0),
      (1L, 103L, 3L, 7.0),   // t=0 still inside [0, 10]
      (1L, 104L, 1L, 8.0),   // t=10 outside [11, 21]
      (2L, 201L, 1L, 16.0)))
  }

  test("rollingWindow peers at the same second share one frame") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 00:00:00"), 2.0)
    ).toDF("k", "id", "ts", "v")
    val got = TimeSeries.rollingWindow(df, "k", "id", "ts", "v", 5L)
      .orderBy("id").collect().map(r => (r.getLong(3), r.getDouble(4)))
    // RANGE frames include ALL peers of the current order value
    assert(got.toSeq === Seq((2L, 3.0), (2L, 3.0)))
  }

  test("periodOverPeriod lags the previous OBSERVED day across gaps") {
    import spark.implicits._
    val df = Seq(
      ("a", ts("2024-01-01 01:00:00")), ("a", ts("2024-01-01 02:00:00")),
      ("a", ts("2024-01-04 01:00:00"))  // gap: prev observed is Jan 1
    ).toDF("k", "ts")
    val got = TimeSeries.periodOverPeriod(df, "k", "ts")
      .orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, -1L, -1.0),
      ("2024-01-04", 1L, 2L, 0.5)))
  }

  test("ewmaDaily folds daily counts in day order") {
    import spark.implicits._
    // days with counts 2, 1, 4 -> ewma: 2; .25*1+.75*2=1.75; .25*4+.75*1.75=2.3125
    val df = Seq(
      ("a", ts("2024-01-01 01:00:00")), ("a", ts("2024-01-01 02:00:00")),
      ("a", ts("2024-01-02 01:00:00")),
      ("a", ts("2024-01-03 01:00:00")), ("a", ts("2024-01-03 02:00:00")),
      ("a", ts("2024-01-03 03:00:00")), ("a", ts("2024-01-03 04:00:00"))
    ).toDF("k", "ts")
    val got = TimeSeries.ewmaDaily(df, "k", "ts", 0.25).collect()
    assert(got.head.getLong(1) === 3L)
    assert(got.head.getDouble(2) === 2.3125)
  }

  test("ewmaDaily with a single day returns that day's count") {
    import spark.implicits._
    val df = Seq(("a", ts("2024-01-01 01:00:00")),
      ("a", ts("2024-01-01 02:00:00"))).toDF("k", "ts")
    val got = TimeSeries.ewmaDaily(df, "k", "ts", 0.25).collect()
    assert(got.head.getDouble(2) === 2.0)
  }

  test("weeklyFromDailyPartials merges partials to the direct weekly answer") {
    import spark.implicits._
    // Mon Jan 1 + Thu Jan 4 (same ISO week), Mon Jan 8 (next week)
    val df = Seq(
      ("a", ts("2024-01-01 05:00:00"), 1.25),
      ("a", ts("2024-01-04 06:00:00"), 2.50),
      ("a", ts("2024-01-08 07:00:00"), 4.00)
    ).toDF("k", "ts", "v")
    val got = TimeSeries.weeklyFromDailyPartials(df, "k", "ts", "v")
      .orderBy("week").collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getDouble(5)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 3.75),
      ("2024-01-08", 1L, 4.0)))
    // min-of-mins / max-of-maxes carry the true week extremes
    val w1 = TimeSeries.weeklyFromDailyPartials(df, "k", "ts", "v")
      .orderBy("week").collect().head
    assert(w1.getLong(3) === ts("2024-01-01 05:00:00").getTime / 1000)
    assert(w1.getLong(4) === ts("2024-01-04 06:00:00").getTime / 1000)
  }

  test("dailySpikes flags only full-baseline days beyond the threshold") {
    import spark.implicits._
    // key A: 3 quiet days (2 events each), then a 5-event day — with
    // lookback 3 the spike rule is 100·3·n > 150·sum: day 4 gives
    // 1500 > 900 → spike; a repeat 2-event day 5 gives 600 >
    // 150·(2+2+5)=1350 → false
    val rows = Seq(
      ("2024-01-01", 2), ("2024-01-02", 2), ("2024-01-03", 2),
      ("2024-01-04", 5), ("2024-01-05", 2)
    ).flatMap { case (d, k) =>
      (0 until k).map(i => ("A", ts(s"$d 0$i:00:00")))
    }
    val got = TimeSeries.dailySpikes(rows.toDF("k", "ts"), "k", "ts",
        lookback = 3, numerPct = 150)
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (2L, 0L, false),  // warm-up: no baseline at all
      (2L, 1L, false),  // warm-up: partial baseline
      (2L, 2L, false),
      (5L, 3L, true),   // 1500 > 900
      (2L, 3L, false))) // 600 < 1350
  }

  test("dowBaselineDeviation: same-weekday mean in exact ppm") {
    import spark.implicits._
    // Mondays 2024-01-01/08/15 with 2, 4, 6 events (mean 4); Tuesday
    // 2024-01-02 with 3 events (its own sole baseline)
    val rows = Seq(
      ("2024-01-01", 2), ("2024-01-08", 4), ("2024-01-15", 6),
      ("2024-01-02", 3)
    ).flatMap { case (d, k) =>
      (0 until k).map(i => ("A", ts(s"$d 0$i:00:00")))
    }
    val got = TimeSeries.dowBaselineDeviation(
        rows.toDF("k", "ts"), "k", "ts")
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(1).toString, r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 2L, 3L, 12L, 500000L),  // 2 vs mean 4
      ("2024-01-02", 1, 3L, 1L, 3L, 1000000L),  // own baseline
      ("2024-01-08", 0, 4L, 3L, 12L, 1000000L), // at the mean
      ("2024-01-15", 0, 6L, 3L, 12L, 1500000L)))
  }

  test("cusumChangepoint peaks at a planted level shift") {
    import spark.implicits._
    // 4 days at 1 event, then 4 days at 5: the mean-rate crossover
    // is after day 4 — |dev| = D·S_i − i·T peaks at i=4
    val rows = (1 to 8).flatMap { d =>
      val k = if (d <= 4) 1 else 5
      (0 until k).map(i => ("A", ts(f"2024-02-0$d 0$i:00:00")))
    }
    val got = TimeSeries.cusumChangepoint(rows.toDF("k", "ts"), "k", "ts")
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    // T = 24, D = 8: dev_i = 8·S_i − 24·i
    assert(got.map(_._3).toSeq ===
      Seq(-16L, -32L, -48L, -64L, -48L, -32L, -16L, 0L))
    assert(got.map(_._4).toSeq ===
      Seq(false, false, false, true, false, false, false, false))
  }

  test("robustOutliers: nearest-rank median/MAD, planted wild day") {
    import spark.implicits._
    // counts 2,2,3,3,50 → med = 3 (rank ⌈5/2⌉ = 3 on sorted 2,2,3,3,50),
    // absdev = 1,1,0,0,47 → MAD = 1 (rank 3 on 0,0,1,1,47);
    // only the 50-day has absdev 47 > 3·1
    val rows = Seq(
      ("2024-01-01", 2), ("2024-01-02", 2), ("2024-01-03", 3),
      ("2024-01-04", 3), ("2024-01-05", 50)
    ).flatMap { case (d, k) =>
      (0 until k).map(i => ("A", ts(f"$d ${i / 60}%02d:${i % 60}%02d:00")))
    }
    val got = TimeSeries.robustOutliers(rows.toDF("k", "ts"), "k", "ts",
        madMult = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    assert(got.toSeq === Seq(
      (2L, 3L, 1L, 1L, false), (2L, 3L, 1L, 1L, false),
      (3L, 3L, 0L, 1L, false), (3L, 3L, 0L, 1L, false),
      (50L, 3L, 47L, 1L, true)))
  }

  test("robustOutliers: MAD=0 flags any deviation") {
    import spark.implicits._
    // counts 5,5,5,9 → med 5, absdevs 0,0,0,4 → MAD 0 → only the
    // 9-day deviates and is flagged
    val rows = Seq(
      ("2024-02-01", 5), ("2024-02-02", 5), ("2024-02-03", 5),
      ("2024-02-04", 9)
    ).flatMap { case (d, k) =>
      (0 until k).map(i => ("A", ts(s"$d 0$i:00:00")))
    }
    val got = TimeSeries.robustOutliers(rows.toDF("k", "ts"), "k", "ts", 3)
      .orderBy("day").collect().map(r => (r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq === Seq((0L, false), (0L, false), (0L, false),
      (0L, true)))
  }

  test("upsertDailyPartials: merge ≡ direct build, new cells appear") {
    import spark.implicits._
    val base = Seq(
      ("A", ts("2024-01-01 01:00:00"), 1.5),
      ("A", ts("2024-01-01 02:00:00"), 2.5),
      ("A", ts("2024-01-02 01:00:00"), 4.0),
      ("B", ts("2024-01-01 03:00:00"), 8.0)).toDF("k", "ts", "v")
    val late = Seq(
      ("A", ts("2024-01-01 00:30:00"), 0.5),  // touches A/01-01
      ("C", ts("2024-01-03 05:00:00"), 9.0))  // brand-new cell
      .toDF("k", "ts", "v")
    val partials = TimeSeries.dailyPartials(base, "k", "ts", "v")
    val got = TimeSeries.upsertDailyPartials(partials, late, "k", "ts", "v")
    val direct = TimeSeries.dailyPartials(base.unionByName(late),
      "k", "ts", "v")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getDate(1).toString)
    val toMap = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => key(r) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDecimal(5).doubleValue))).toMap
    assert(toMap(got) === toMap(direct))
    // untouched cells (A/01-02, B/01-01) pass through the anti-join
    assert(toMap(got)(("A", "2024-01-02")) ===
      toMap(partials)(("A", "2024-01-02")))
  }

  test("cusumChangepoint: flat series peaks at day 1 with dev 0") {
    import spark.implicits._
    val rows = (1 to 3).map(d => ("A", ts(s"2024-03-0$d 00:00:00")))
    val got = TimeSeries.cusumChangepoint(rows.toDF("k", "ts"), "k", "ts")
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq === Seq((0L, true), (0L, false), (0L, false)))
  }

  test("holtDaily: level/trend match the hand-rolled recurrence") {
    import spark.implicits._
    // one event per (day, i<n) → daily counts 10, 20, 30 on day 1..3
    val rows = for {
      (day, n) <- Seq(("01", 10), ("02", 20), ("03", 30))
      i <- 1 to n
    } yield ("k", ts(s"2024-01-$day 00:00:0${i % 10}"))
    val df = rows.toDF("k", "ts")
    val got = TimeSeries.holtDaily(df, "k", "ts",
        alpha = 0.5, beta = 0.25, horizon = 2)
      .select("n_days", "level", "trend", "forecast").collect().head
    // l1=10,b1=0; l2=.5*20+.5*10=15, b2=.25*5=1.25;
    // l3=.5*30+.5*16.25=23.125, b3=.25*8.125+.75*1.25=2.96875
    assert(got.getLong(0) === 3L)
    assert(got.getDouble(1) === 23.125)
    assert(got.getDouble(2) === 2.96875)
    assert(got.getDouble(3) === 23.125 + 2 * 2.96875)
  }

  test("holtDaily: single-day key degrades to (level=n, trend=0)") {
    import spark.implicits._
    val df = Seq(("k", ts("2024-01-01 00:00:00")),
      ("k", ts("2024-01-01 00:00:01"))).toDF("k", "ts")
    val got = TimeSeries.holtDaily(df, "k", "ts", 0.5, 0.25, 7)
      .select("level", "trend").collect().head
    assert(got.getDouble(0) === 2.0 && got.getDouble(1) === 0.0)
  }

  test("backtestNaive: seasonal-naive wins on a planted period-7 series") {
    import spark.implicits._
    // 21 days of a strict period-7 pattern: counts 1..7 repeating.
    // Seasonal-naive is perfect from day 8 on; naive is not.
    val rows = for {
      d <- 0 until 21
      i <- 1 to (d % 7) + 1
    } yield ("k", ts(f"2024-01-${d + 1}%02d 00:00:0${i % 10}"))
    val got = TimeSeries.backtestNaive(rows.toDF("k", "ts"), "k", "ts")
      .select("n_scored", "ae_naive", "ae_snaive", "winner")
      .collect().head
    assert(got.getLong(0) === 14L)
    assert(got.getLong(2) === 0L)          // seasonal error zero
    assert(got.getLong(1) > 0L)            // naive pays at each wrap
    assert(got.getString(3) === "seasonal_naive")
  }

  test("backtestNaive: keys with < 8 observed days produce no row") {
    import spark.implicits._
    val rows = (1 to 7).map(d => ("k", ts(f"2024-01-$d%02d 00:00:00")))
    assert(TimeSeries.backtestNaive(rows.toDF("k", "ts"), "k", "ts").count() === 0L)
  }
}
