package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {

  test("exactQuantiles picks the ceil(p*n) ranked value per group") {
    import spark.implicits._
    // group a: 1..10 -> p50 = 5 (rank 5), p90 = 9, p99 = 10 (rank ceil(9.9)=10)
    val df = ((1 to 10).map(i => ("a", i.toDouble)) :+ (("b", 7.0)))
      .toDF("k", "v")
    val got = Quantiles.exactQuantiles(df, "k", "v", Seq(0.5, 0.9, 0.99))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("a", 10L, 5.0, 9.0, 10.0),
      ("b", 1L, 7.0, 7.0, 7.0)))
  }

  test("exactQuantiles is tie-safe: duplicated values select deterministically") {
    import spark.implicits._
    val df = Seq.fill(6)(("a", 2.0)).toDF("k", "v")
    val got = Quantiles.exactQuantiles(df, "k", "v", Seq(0.5)).collect()
    assert(got.head.getDouble(2) === 2.0)
  }

  test("histogramQuantiles reports the first bin's upper edge at each p") {
    import spark.implicits._
    // width 10: values 1..10 in bin 0 (edge 10) except 10 in bin 1 (edge 20)
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("k", "v")
    val got = Quantiles.histogramQuantiles(df, "k", "v", 10.0,
      Seq(0.5, 0.99)).collect()
    // bin 0 holds 9 of 10 -> cum 9 >= ceil(.5*10)=5 -> p50_est = 10
    // ceil(.99*10)=10 needs cum 10 -> bin 1 -> p99_est = 20
    assert((got.head.getLong(1), got.head.getDouble(2),
      got.head.getDouble(3)) === (10L, 10.0, 20.0))
  }

  test("histogramQuantiles error is bounded by binWidth vs the exact answer") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("a", i.toDouble * 3.0)).toDF("k", "v")
    val exact = Quantiles.exactQuantiles(df, "k", "v", Seq(0.5, 0.9))
      .collect().head
    val est = Quantiles.histogramQuantiles(df, "k", "v", 50.0,
      Seq(0.5, 0.9)).collect().head
    for (i <- 2 to 3) {
      // quantile on a bin LOWER edge makes the diff exactly binWidth
      val e = est.getDouble(i) - exact.getDouble(i)
      assert(e > 0 && e <= 50.0,
        s"estimate must be within one bin above exact, got diff $e")
    }
  }
}
