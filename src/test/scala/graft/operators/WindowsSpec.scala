package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowsSpec extends SparkSpec {

  test("orderStatsScalable equals the collect_list form on real data") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val a = Windows.orderStats(li, "l_suppkey", "l_extendedprice", Seq(1, 5, 10))
      .orderBy("l_suppkey").collect().map(_.toSeq)
    val b = Windows.orderStatsScalable(li, "l_suppkey", "l_extendedprice",
        Seq(1, 5, 10))
      .orderBy("l_suppkey").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("orderStatsScalable: groups smaller than a rank yield null") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("k", "v")
    val got = Windows.orderStatsScalable(df, "k", "v", Seq(1, 3))
      .orderBy("k").collect()
      .map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq === Seq(
      (1, Some(20.0), None), (2, Some(5.0), None)))
  }

  test("debounceCounts: kept is relative to the last KEPT event") {
    import spark.implicits._
    // quiet = 10 s; events at t = 0, 5, 12, 21, 22: sessionize(10 s)
    // would collapse everything after one gap, but TRUE debounce
    // keeps 0 (first), drops 5 (5-0), keeps 12 (12-0), drops 21
    // (21-12=9), drops 22 — kept = 2, last = 12 000 ms
    val base = 1700000000000L
    val rows = Seq(0L, 5000L, 12000L, 21000L, 22000L)
      .map(off => ("A", new java.sql.Timestamp(base + off)))
    val got = Windows.debounceCounts(rows.toDF("k", "ts"), "k", "ts",
        quietMs = 10000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(("A", 5L, 2L, base + 12000L)))
  }
}
