package graft.operators

import graft.SparkSpec

/** Boundary semantics of the time-travel joins (q116/q117 gate them
  * at corpus scale against DuckDB's native ASOF JOIN / a theta join).
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfBackward: latest at-or-before, inclusive boundary, nulls") {
    val left = Seq((1L, 100L, "e1"), (1L, 200L, "e2"), (1L, 250L, "e3"),
      (2L, 50L, "e4")).toDF("k", "t", "ev")
    val right = Seq((1L, 100L, "a"), (1L, 200L, "b"), (3L, 10L, "z"))
      .toDF("k", "vt", "cfg")
    val out = TemporalJoins.asOfBackward(left, right, "k", "t", "vt",
        Seq("cfg"))
      .collect()
      .map(r => r.getString(2) -> ((Option(r.get(3)), Option(r.get(4)))))
      .toMap
    // t=100 matches vt=100 (inclusive ≤), not the later vt=200
    assert(out("e1") == ((Some(100L), Some("a"))))
    assert(out("e2") == ((Some(200L), Some("b"))))
    assert(out("e3") == ((Some(200L), Some("b"))))
    // key 2 has no versions at all → null match
    assert(out("e4") == ((None, None)))
  }

  test("asOfBackward: left rows before the first right row stay null") {
    val left = Seq((1L, 10L, "early"), (1L, 99L, "still"), (1L, 150L, "ok"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 100L, "v0")).toDF("k", "vt", "cfg")
    val out = TemporalJoins.asOfBackward(left, right, "k", "t", "vt",
        Seq("cfg"))
      .collect().map(r => r.getString(2) -> Option(r.get(4))).toMap
    assert(out("early").isEmpty && out("still").isEmpty)
    assert(out("ok").contains("v0"))
  }

  test("asOfBackward: many right rows per key do not amplify left rows") {
    val left = (0 until 10).map(i => (1L, i * 1000L, s"e$i"))
      .toDF("k", "t", "ev")
    val right = (0 until 500).map(j => (1L, j * 10L, s"v$j"))
      .toDF("k", "vt", "cfg")
    val out = TemporalJoins.asOfBackward(left, right, "k", "t", "vt",
      Seq("cfg"))
    assert(out.count() === 10) // exactly one row per left row
    val m = out.collect().map(r => r.getString(2) -> r.getString(4)).toMap
    assert(m("e3") === "v300") // 3000 ms → latest vt = 3000 = v300
  }

  test("rangeJoinBucketed equals the naive theta join, [start,end)") {
    val pts = Seq((1L, 0L, 10L), (1L, 100L, 11L), (1L, 250L, 12L),
      (1L, 300L, 13L), (2L, 100L, 14L)).toDF("g", "t", "pid")
    val ivs = Seq(
      (1L, 100L, 300L, 1L),  // catches 100, 250; NOT 300 (exclusive)
      (1L, 0L, 50L, 2L),     // catches 0
      (1L, 400L, 400L, 3L),  // empty: dropped
      (2L, 90L, 110L, 4L))   // catches (2,100)
      .toDF("g", "s", "e", "iid")
    val got = TemporalJoins.rangeJoinBucketed(pts, ivs, "g", "t", "s", "e",
        bucketMs = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = pts.as[(Long, Long, Long)].collect().flatMap { case (g, t, pid) =>
      ivs.as[(Long, Long, Long, Long)].collect().collect {
        case (g2, s0, e0, iid) if g2 == g && t >= s0 && t < e0 => (pid, iid)
      }
    }.toSet
    assert(got == want)
    assert(got == Set((11L, 1L), (12L, 1L), (10L, 2L), (14L, 4L)))
  }

  test("rangeJoinBucketed: intervals spanning many buckets match once") {
    val pts = Seq((1L, 500L, 1L)).toDF("g", "t", "pid")
    val ivs = Seq((1L, 0L, 10000L, 7L)).toDF("g", "s", "e", "iid")
    val rows = TemporalJoins.rangeJoinBucketed(pts, ivs, "g", "t", "s", "e",
      bucketMs = 100L).collect()
    assert(rows.length === 1) // 100 bucket replicas, exactly one match
  }
}
