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
}
