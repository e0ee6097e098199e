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

  test("asOfBackward: right rows tying on (key, time) resolve deterministically") {
    // two snapshots at the same instant: the payload-struct tiebreak
    // must pick the same one regardless of partitioning — largest wins
    val left = Seq((1L, 150L, "e")).toDF("k", "t", "ev")
    val right = Seq((1L, 100L, "alpha"), (1L, 100L, "zeta"))
      .toDF("k", "vt", "cfg")
    val picks = (1 to 5).map { _ =>
      TemporalJoins.asOfBackward(
          left.repartition(7), right.repartition(3), "k", "t", "vt",
          Seq("cfg"))
        .collect().head.getString(4)
    }
    assert(picks.distinct == Seq("zeta"))
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

  test("randomized: asOfBackward equals the naive per-row maximum") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    // right times unique per construction (j*7 mod 997, 997 prime) so
    // the naive argmax is unique and no tie policy is needed
    val right = Seq.tabulate(120)(j =>
      (rnd.nextInt(8).toLong, (j * 7 % 997).toLong, s"c$j"))
    val got = TemporalJoins.asOfBackward(
        left.toDF("k", "t", "lid"), right.toDF("k", "vt", "cfg"),
        "k", "t", "vt", Seq("cfg"))
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(4)).map(_.toString)).toMap
    assert(got.size === 300)
    left.foreach { case (k, t, lid) =>
      val want = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(lid) == want, s"left row $lid (k=$k t=$t)")
    }
  }

  test("randomized: intervalOverlapJoin equals the naive theta join") {
    val rnd = new scala.util.Random(7)
    val a = Seq.tabulate(150) { i =>
      val s0 = rnd.nextInt(2000).toLong
      (rnd.nextInt(5).toLong, s0, s0 + 1 + rnd.nextInt(400), i.toLong)
    }
    val b = Seq.tabulate(150) { j =>
      val s0 = rnd.nextInt(2000).toLong
      (rnd.nextInt(5).toLong, s0, s0 + 1 + rnd.nextInt(400), (1000 + j).toLong)
    }
    val got = TemporalJoins.intervalOverlapJoin(
        a.toDF("g", "as", "ae", "aid"), b.toDF("g", "bs", "be", "bid"),
        "g", "as", "ae", "bs", "be", bucketMs = 128L)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (g1, as1, ae1, aid) <- a
      (g2, bs1, be1, bid) <- b
      if g1 == g2 && as1 < be1 && bs1 < ae1
    } yield (aid, bid)).toSet
    assert(got == want)
  }
}
