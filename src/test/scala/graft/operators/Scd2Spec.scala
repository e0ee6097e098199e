package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fromChangeLog collapses repeats and chains valid_to") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A", 1L),
      (1L, ts("2024-01-02 00:00:00"), "A", 2L), // repeat — collapses
      (1L, ts("2024-01-03 00:00:00"), "B", 3L),
      (1L, ts("2024-01-04 00:00:00"), "A", 4L), // back to A: NEW interval
      (2L, ts("2024-01-01 00:00:00"), "X", 5L)
    ).toDF("id", "ts", "state", "seq")
    val got = Scd2.fromChangeLog(log, Seq("id"), Seq("state"), "ts", "seq")
      .orderBy(col("id"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, "A", ts("2024-01-04 00:00:00"), None, true),
      (2L, "X", ts("2024-01-01 00:00:00"), None, true)))
  }

  test("fromChangeLog: a NULL attr on the first row still opens an interval") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), Option.empty[String], 1L),
      (1L, ts("2024-01-02 00:00:00"), Option.empty[String], 2L), // repeat null
      (1L, ts("2024-01-03 00:00:00"), Some("A"), 3L)
    ).toDF("id", "ts", "state", "seq")
    val got = Scd2.fromChangeLog(log, Seq("id"), Seq("state"), "ts", "seq")
      .orderBy(col("valid_from")).collect()
    assert(got.length === 2)
    assert(got(0).isNullAt(1) && !got(0).getBoolean(4))
    assert(got(1).getString(1) === "A" && got(1).getBoolean(4))
  }

  test("fromChangeLog: equal timestamps break ties on the seq column") {
    val t = ts("2024-01-01 00:00:00")
    val log = Seq((1L, t, "B", 2L), (1L, t, "A", 1L))
      .toDF("id", "ts", "state", "seq")
    val got = Scd2.fromChangeLog(log, Seq("id"), Seq("state"), "ts", "seq")
      .orderBy(col("is_current")).collect()
    // seq order: A then B — A closed (at the same instant), B current
    assert(got.map(_.getString(1)).toSeq === Seq("A", "B"))
  }

  private val histDf = Seq(
    // closed history row passes through untouched
    (1L, "old", Some(ts("2023-01-01 00:00:00")), Some(ts("2024-01-01 00:00:00"))),
    (1L, "a", Some(ts("2024-01-01 00:00:00")), Option.empty[Timestamp]),
    (2L, "b", Some(ts("2024-01-01 00:00:00")), Option.empty[Timestamp]),
    (3L, "c", Some(ts("2024-01-01 00:00:00")), Option.empty[Timestamp])
  ).toDF("id", "state", "valid_from", "valid_to")

  private val updDf = Seq(
    (1L, "a2", ts("2024-06-01 00:00:00")), // changed
    (2L, "b", ts("2024-06-01 00:00:00")),  // no-op
    (9L, "new", ts("2024-06-01 00:00:00")) // first-seen key
  ).toDF("id", "state", "eff")

  test("merge: change closes + opens, no-op keeps, new key inserts") {
    val got = Scd2.merge(histDf, updDf, Seq("id"), Seq("state"), "eff")
      .orderBy(col("id"), col("valid_from")).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getTimestamp(3)),
        r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, "old", Some(ts("2024-01-01 00:00:00")), false),
      (1L, "a", Some(ts("2024-06-01 00:00:00")), false),   // closed now
      (1L, "a2", None, true),                              // opened
      (2L, "b", None, true),                               // no-op kept
      (3L, "c", None, true),                               // untouched
      (9L, "new", None, true)))                            // inserted
  }

  test("merge ignores a late changed update instead of inverting the interval") {
    // key 1's current version starts 2024-01-01; a straggler carrying
    // an OLDER timestamp with different attrs must not close it at a
    // time before it began (inverted interval) nor promote stale state
    val late = Seq((1L, "stale", ts("2023-06-01 00:00:00")))
      .toDF("id", "state", "eff")
    val got = Scd2.merge(histDf, late, Seq("id"), Seq("state"), "eff")
      .filter(col("id") === 1L)
      .orderBy(col("valid_from")).collect()
      .map(r => (r.getString(1), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("old", Some(ts("2024-01-01 00:00:00")), false),
      ("a", None, true))) // current untouched, straggler dropped
  }

  test("merge treats NULL valid_from as unknown-start, closable") {
    val hist = Seq((1L, "a", Option.empty[Timestamp], Option.empty[Timestamp]))
      .toDF("id", "state", "valid_from", "valid_to")
    val upd = Seq((1L, "b", ts("2024-01-01 00:00:00"))).toDF("id", "state", "eff")
    val got = Scd2.merge(hist, upd, Seq("id"), Seq("state"), "eff")
      .orderBy(col("is_current")).collect()
      .map(r => (r.getString(1), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("a", Some(ts("2024-01-01 00:00:00")), false), // unknown start, closed
      ("b", None, true)))
  }

  test("merge is idempotent: replaying the same batch changes nothing") {
    val once = Scd2.merge(histDf, updDf, Seq("id"), Seq("state"), "eff")
    val twice = Scd2.merge(once.drop("is_current"), updDf,
      Seq("id"), Seq("state"), "eff")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("pitLookup attaches the containing version, NULLs in gaps") {
    val hist = Seq(
      (1L, "a", Some(ts("2024-01-01 00:00:00")), Some(ts("2024-02-01 00:00:00"))),
      // GAP: nothing live for key 1 in [02-01, 03-01)
      (1L, "b", Some(ts("2024-03-01 00:00:00")), Option.empty[Timestamp]),
      (2L, "x", Option.empty[Timestamp], Option.empty[Timestamp]) // unknown start
    ).toDF("id", "state", "valid_from", "valid_to")
    val facts = Seq(
      (10L, 1L, ts("2024-01-15 00:00:00")), // inside a
      (11L, 1L, ts("2024-02-15 00:00:00")), // in the gap → NULL, not stale a
      (12L, 1L, ts("2024-03-01 00:00:00")), // boundary: b starts exactly here
      (13L, 2L, ts("2020-01-01 00:00:00")), // unknown-start matches anything
      (14L, 3L, ts("2024-01-01 00:00:00"))  // key with no history
    ).toDF("fact_id", "id", "ts")
    val got = Scd2.pitLookup(facts, hist, "id", "ts", Seq("state"))
      .orderBy(col("fact_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got === Map(10L -> Some("a"), 11L -> None, 12L -> Some("b"),
      13L -> Some("x"), 14L -> None))
  }

  test("merge then fromChangeLog agree on a rebuilt timeline") {
    // the incremental path must land on the same history the bulk
    // rebuild computes from the concatenated change log
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (2L, ts("2024-01-01 00:00:00"), "b", 2L),
      (1L, ts("2024-06-01 00:00:00"), "a2", 3L)
    ).toDF("id", "ts", "state", "seq")
    val bulk = Scd2.fromChangeLog(log, Seq("id"), Seq("state"), "ts", "seq")
    val day1 = Scd2.fromChangeLog(
      log.filter(col("ts") < ts("2024-06-01 00:00:00")),
      Seq("id"), Seq("state"), "ts", "seq")
    val inc = Scd2.merge(day1.drop("is_current"),
      Seq((1L, "a2", ts("2024-06-01 00:00:00"))).toDF("id", "state", "eff"),
      Seq("id"), Seq("state"), "eff")
    assert(inc.exceptAll(bulk).isEmpty && bulk.exceptAll(inc).isEmpty)
  }
}
