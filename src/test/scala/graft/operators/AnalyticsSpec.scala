package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("rollupSummary emits leaves, subtotals, grand total with gid levels") {
    import spark.implicits._
    val df = Seq(
      ("hi", "open", 10.0), ("hi", "open", 5.0), ("hi", "done", 2.0),
      ("lo", "open", 1.0)
    ).toDF("prio", "status", "amt")
    val got = Analytics.rollupSummary(df, "prio", "status", col("amt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) -> (r.getLong(3), r.getDouble(4))))
      .toSet
    assert(got === Set(
      ("hi", "open", 0L -> (2L, 15.0)),
      ("hi", "done", 0L -> (1L, 2.0)),
      ("lo", "open", 0L -> (1L, 1.0)),
      ("hi", "total", 1L -> (3L, 17.0)),
      ("lo", "total", 1L -> (1L, 1.0)),
      ("total", "total", 3L -> (4L, 18.0))))
  }

  test("cubeSummary adds the second margin rollup misses") {
    import spark.implicits._
    val df = Seq(("hi", "open", 10.0), ("lo", "open", 1.0))
      .toDF("prio", "status", "amt")
    val got = Analytics.cubeSummary(df, "prio", "status", col("amt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(4)))
      .toSet
    assert(got === Set(
      ("hi", "open", 0L, 10.0), ("lo", "open", 0L, 1.0),
      ("hi", "total", 1L, 10.0), ("lo", "total", 1L, 1.0),
      ("total", "open", 2L, 11.0),   // the status margin: cube-only
      ("total", "total", 3L, 11.0)))
  }

  test("pivotCounts pins the schema and zero-fills absent combos") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("g", "t")
    val got = Analytics.pivotCounts(df, "g", "t", Seq("a", "b", "c"))
      .orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 0L, 0L), (2L, 0L, 1L, 0L)))
  }

  test("gapFillDaily carries last observation over gaps, 0 before first sight") {
    import spark.implicits._
    // span 2024-01-01..01-04 set by group x; group y first appears 01-03
    val df = Seq(
      ("x", ts("2024-01-01 08:00:00")), ("x", ts("2024-01-01 09:00:00")),
      ("x", ts("2024-01-04 08:00:00")),
      ("y", ts("2024-01-03 12:00:00"))
    ).toDF("g", "ts")
    val got = Analytics.gapFillDaily(df, "g", "ts")
      .orderBy("g", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      ("x", "2024-01-01", 2L, false),
      ("x", "2024-01-02", 2L, true),  // gap carries the 2
      ("x", "2024-01-03", 2L, true),
      ("x", "2024-01-04", 1L, false),
      ("y", "2024-01-01", 0L, true),  // before first sight: 0
      ("y", "2024-01-02", 0L, true),
      ("y", "2024-01-03", 1L, false),
      ("y", "2024-01-04", 1L, true)))
  }

  test("cohortRetention buckets users by first week and counts later activity") {
    import spark.implicits._
    // weeks: 2024-01-01 (Mon) and 2024-01-08; u1 active both, u2 only w2
    val df = Seq(
      (1L, ts("2024-01-02 00:00:00")), (1L, ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-09 00:00:00"))
    ).toDF("user_id", "ts")
    val got = Analytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("funnel requires strict stage order per user") {
    import spark.implicits._
    val df = Seq(
      // u1 completes view -> click -> buy in order
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "buy", ts("2024-01-01 02:00:00")),
      // u2 clicked BEFORE viewing; the later buy has no ordered click
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      (2L, "buy", ts("2024-01-01 02:00:00")),
      // u3 only views
      (3L, "view", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "view", 3L), (2, "click", 1L), (3, "buy", 1L)))
  }

  test("rankMetrics is deterministic under value ties via the tie column") {
    import spark.implicits._
    // four tied values: ntile(2) must split 2/2 by id order, every run
    val df = Seq((1L, "g", 5.0), (2L, "g", 5.0), (3L, "g", 5.0),
      (4L, "g", 5.0)).toDF("id", "k", "v")
    val got = Analytics.rankMetrics(df, "k", "v", "id", 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 0.0, 0.25, 1L), (2L, 1.0 / 3, 0.5, 1L),
      (3L, 2.0 / 3, 0.75, 2L), (4L, 1.0, 1.0, 2L)))
  }

  test("funnel counts a re-click after view even when an earlier click exists") {
    import spark.implicits._
    val df = Seq(
      (9L, "click", ts("2024-01-01 00:00:00")),
      (9L, "view", ts("2024-01-01 01:00:00")),
      (9L, "click", ts("2024-01-01 02:00:00")),
      (9L, "buy", ts("2024-01-01 03:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("view", 1L), ("click", 1L), ("buy", 1L)))
  }

  test("linearAttribution splits ppm credit with remainder to last touch") {
    import spark.implicits._
    val df = Seq(
      // conv 100: 3 touches in window → 333333 each, +1 to the last
      (1L, 10L, "view", ts("2024-01-01 08:00:00")),
      (1L, 11L, "click", ts("2024-01-01 09:00:00")),
      (1L, 12L, "view", ts("2024-01-01 10:00:00")),
      (1L, 100L, "purchase", ts("2024-01-01 12:00:00")),
      // outside the 24h lookback of conv 100 — no credit
      (1L, 13L, "click", ts("2023-12-30 12:00:00")),
      // user 2: conv with no touches → contributes nothing
      (2L, 200L, "purchase", ts("2024-01-05 00:00:00")),
      // user 3: one touch exactly at the conversion instant (<=) —
      // single touch takes the full million
      (3L, 30L, "click", ts("2024-01-02 00:00:00")),
      (3L, 300L, "purchase", ts("2024-01-02 00:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Analytics.linearAttribution(df, "user_id", "event_type",
        "ts", "event_id", Seq("view", "click"), "purchase", 24)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // conv 100's last touch is view#12 (gets 333333+1+333333); click
    // #11 gets 333333; conv 300's click#30 gets 1000000
    assert(got === Map(
      "view" -> (2L, 1L, 666667L),
      "click" -> (2L, 2L, 1333333L)))
    // reconciliation: total credit = 1e6 × conversions with ≥1 touch
    assert(got.values.map(_._3).sum === 2000000L)
  }

  test("abLift partitions units deterministically and counts conversion") {
    import spark.implicits._
    val df = (1L to 40L).flatMap { u =>
      Seq((u, "view")) ++ (if (u % 4 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val got = Analytics.abLift(df, "user_id", "event_type", "purchase", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // every unit in exactly one bucket; converted = multiples of 4
    assert(got.keySet.subsetOf(Set(0L, 1L)))
    assert(got.values.map(_._1).sum === 40L)
    assert(got.values.map(_._2).sum === 10L)
    got.values.foreach { case (n, c, ppm) => assert(ppm === 1000000L * c / n) }
    // stateless: a second computation assigns identically
    val again = Analytics.abLift(df, "user_id", "event_type", "purchase", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(again === got)
  }

  test("aucExact: hand-computed AUC with ties; perfect and inverted") {
    import spark.implicits._
    // pos scores {3, 2}, neg {1, 2}: pairwise 1 + 1 + 1 + ½ = 3.5 of
    // 4 → AUC 0.875, 2U = 7
    val df = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("s", "y")
    val r = Analytics.aucExact(df, "s", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 7L)))
    assert(r.getDouble(3) === 0.875)
    // perfectly separating score → 1.0; inverted labels → 0.0
    val sep = Seq((10L, true), (9L, true), (1L, false)).toDF("s", "y")
    assert(Analytics.aucExact(sep, "s", "y").collect().head.getDouble(3)
      === 1.0)
    val inv = Seq((10L, false), (1L, true)).toDF("s", "y")
    assert(Analytics.aucExact(inv, "s", "y").collect().head.getDouble(3)
      === 0.0)
  }

  test("aucExact accepts fractional (double) score columns") {
    import spark.implicits._
    // same pairwise structure as the long fixture, scores scaled to
    // sub-integer doubles (the common classifier-probability shape
    // the div-bucketed rank used to reject with DATATYPE_MISMATCH)
    val df = Seq((0.3, true), (0.2, true), (0.1, false), (0.2, false))
      .toDF("s", "y")
    val r = Analytics.aucExact(df, "s", "y").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 7L)))
    assert(r.getDouble(3) === 0.875)
    // and negative fractional scores (floor-bucketing, not div)
    val neg = Seq((-0.5, true), (-1.5, false), (-2.5, false))
      .toDF("s", "y")
    assert(Analytics.aucExact(neg, "s", "y").collect().head.getDouble(3)
      === 1.0)
  }

  test("funnelWindowed: conversion window gates each stage") {
    import spark.implicits._
    // u1 converts fully inside 1-day windows; u2's click comes 2 days
    // after view (outside the window) so click/purchase never count;
    // u3 has click BEFORE view (strictly-after violated)
    val rows = Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 10:00:00"),
      (1L, "purchase", "2024-01-02 05:00:00"),
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-03 00:00:00"),
      (2L, "purchase", "2024-01-03 01:00:00"),
      (3L, "click", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-01 01:00:00"))
      .map { case (u, e, t) => (u, e, ts(t)) }
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnelWindowed(rows, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), windowMs = 86400000L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), !r.isNullAt(1), !r.isNullAt(2),
        !r.isNullAt(3)))
    assert(got.toSeq === Seq(
      (1L, true, true, true),
      (2L, true, false, false),
      (3L, true, false, false)))
  }

  test("ksStatistic: hand-computed D on a small two-sample fixture") {
    import spark.implicits._
    // A = {1,2,3}, B = {3,4,5}: D = |F_A(3) − F_B(3)| ... max gap at
    // v=2: F_A=2/3, F_B=0 → d_num = |2·3 − 0·3| = 6 over n_a·n_b=9
    val df = Seq((1L, true), (2L, true), (3L, true),
      (3L, false), (4L, false), (5L, false)).toDF("v", "g")
    val r = Analytics.ksStatistic(df, col("g"), "v").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 3L)))
    assert(r.getLong(2) === 6L)
    assert(r.getLong(3) === 666666L)
    // identical samples → D = 0
    val same = Seq((1L, true), (1L, false), (9L, true), (9L, false))
      .toDF("v", "g")
    assert(Analytics.ksStatistic(same, col("g"), "v")
      .collect().head.getLong(2) === 0L)
    // disjoint supports → D = n_a·n_b (ppm = 1e6)
    val disj = Seq((1L, true), (2L, true), (8L, false))
      .toDF("v", "g")
    assert(Analytics.ksStatistic(disj, col("g"), "v")
      .collect().head.getLong(3) === 1000000L)
  }
}
