package graft.operators

import graft.SparkSpec

/** Locks the reference's loop semantics (hand-computed goldens from
  * executing `CalculateBrownouts/Blackouts/lowest_qoe` mentally per
  * `powerbi_main_fun.py:1709-1804`) and proves the declarative
  * run-length restatement equal to the literal loop on seeded random
  * series (deterministic property check).
  */
class QoeSpec extends SparkSpec {

  test("transitions: golden sequences incl. the timer-run quirk") {
    // 4→2 with a continuing 2-run: one brownout, timer = run length.
    assert(Qoe.transitions(IndexedSeq(4, 2, 2, 2), 4, 2) === (1, 3))
    // Two separate transitions.
    assert(Qoe.transitions(IndexedSeq(4, 2, 4, 2), 4, 2) === (2, 2))
    // Consecutive 4s: only the one directly before the 2 fires.
    assert(Qoe.transitions(IndexedSeq(4, 4, 2, 2), 4, 2) === (1, 2))
    // Run at sequence start has no predecessor: nothing.
    assert(Qoe.transitions(IndexedSeq(2, 2, 2), 4, 2) === (0, 0))
    // Trailing 4 (no next element): nothing.
    assert(Qoe.transitions(IndexedSeq(2, 4), 4, 2) === (0, 0))
    // Interleaved: 4,2,4,2,2 → 2 brownouts, timers 1 + 2.
    assert(Qoe.transitions(IndexedSeq(4, 2, 4, 2, 2), 4, 2) === (2, 3))
    assert(Qoe.transitions(IndexedSeq.empty, 4, 2) === (0, 0))
  }

  test("dailyLinkOutages: blackouts sum the three preceding-state calls") {
    // 3→0 run of 2, then 2→0 run of 1, then 4→0 run of 1.
    val states = IndexedSeq(3, 0, 0, 2, 0, 4, 0)
    val (nb, bm, nk, km, lo) = Qoe.dailyLinkOutages(states)
    assert(nb === 0 && bm === 0.0)
    assert(nk === 3)
    // ticks = 2 + 1 + 1 = 4 → round(4*7.12/60, 3) = 0.475
    assert(km === 0.475)
    // one chunk of 7: one 4, one 3 → (10 + 5)/8 = 1.875
    assert(lo === 1.875)
  }

  test("lowestQoe: fixed divisor 8, short last chunk, empty series") {
    assert(Qoe.lowestQoe(Seq.fill(8)(4)) === 10.0)
    // 9 samples: chunk of 8 fours (10.0) + chunk of one 3 (5/8)
    assert(Qoe.lowestQoe(Seq.fill(8)(4) :+ 3) === 0.625)
    assert(Qoe.lowestQoe(Nil) === 0.0)
  }

  test("DailyQOE gold slice: outages merge idempotently on (day, key)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sinks.JdbcUpsertSink
    val url = "jdbc:derby:memory:dailyqoe;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE DailyQOE") catch { case _: Exception => () }
      st.executeUpdate(
        """CREATE TABLE DailyQOE (day DATE, group_key BIGINT,
          |  n_brownouts INT, brownout_min DOUBLE,
          |  n_blackouts INT, blackout_min DOUBLE, lowest_score DOUBLE,
          |  PRIMARY KEY (day, group_key))""".stripMargin)
      st.close()
    } finally conn.close()

    val rows = Seq(4, 2, 2, 3, 0).zipWithIndex.map { case (st, i) =>
      (9L, java.sql.Timestamp.valueOf(f"2024-02-01 00:00:0$i"), i.toLong, st)
    }
    val out = Qoe.outagesByGroup(rows.toDF("user_id", "ts", "event_id", "state"),
      "user_id", to_date(col("ts")), "ts", "event_id", "state")
    JdbcUpsertSink.write(out, url, "DailyQOE", Seq("day", "group_key"),
      JdbcUpsertSink.DerbyMerge)
    JdbcUpsertSink.write(out, url, "DailyQOE", Seq("day", "group_key"),
      JdbcUpsertSink.DerbyMerge) // replay
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT n_brownouts, brownout_min, n_blackouts FROM DailyQOE")
      assert(rs.next())
      // 4,2,2 → one brownout of 2 ticks; 3→0 → one blackout of 1 tick
      assert((rs.getInt(1), rs.getDouble(2), rs.getInt(3)) === ((1, 0.237, 1)))
      assert(!rs.next())
    } finally c2.close()
  }

  test("declarative dailyOutagesDF equals the literal loop on random series") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // One batch: 30 independent users, 40 samples each, states 0-4 —
    // a single Spark job checks all 30 series at once.
    val cases = (1 to 30).map { u =>
      u.toLong -> IndexedSeq.fill(40)(rnd.nextInt(5))
    }
    val rows = for {
      (u, states) <- cases
      (st, i) <- states.zipWithIndex
      // minutes/seconds split so timestamp order equals index order for
      // ANY sample count (millis-encoding overflowed past 60 samples)
    } yield (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), i.toLong, st)
    val df = rows.toDF("user_id", "ts", "event_id", "state")
    val decl = Qoe.dailyOutagesDF(df, "user_id", to_date(col("ts")), "ts",
        "event_id", "state").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("n_brownouts"), r.getAs[Double]("brownout_min"),
          r.getAs[Int]("n_blackouts"), r.getAs[Double]("blackout_min"))))
      .toMap
    for ((u, states) <- cases) {
      val (nb, bm, nk, km, _) = Qoe.dailyLinkOutages(states)
      assert(decl(u) === ((nb, bm, nk, km)), s"user=$u states=$states")
    }
  }
}
