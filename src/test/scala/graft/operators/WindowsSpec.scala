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
}
