package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  test("fastSigmoid: σ̂(0)=0.5, monotone, bounded in (0,1)") {
    import spark.implicits._
    val zs = Seq(-100.0, -2.0, -0.5, 0.0, 0.5, 2.0, 100.0)
    val got = zs.toDF("z")
      .select(col("z"), Classifier.fastSigmoid(col("z")).as("p"))
      .orderBy("z").collect().map(_.getDouble(1))
    assert(got.toSeq === got.sorted.toSeq)          // monotone
    assert(got.forall(p => p > 0.0 && p < 1.0))     // bounded
    assert(got(3) === 0.5)                          // σ̂(0)
  }

  test("lrTrain separates a planted linear rule and lrScore tracks it") {
    import spark.implicits._
    // y = 1 iff x1 > 0.5: two clean clusters on the x1 axis
    val rows = (0 until 200).map { i =>
      val x1 = if (i % 2 == 0) 0.9 + (i % 10) * 0.01 else 0.1 - (i % 10) * 0.01
      (i.toLong, 1.0, x1, if (x1 > 0.5) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "x0", "x1", "y")
    val feats = Seq(col("x0"), col("x1"))
    val w = Classifier.lrTrain(df, feats, col("y"),
      init = Seq(0.0, 0.0), eta = 2.0, rounds = 20)
    // positive-class feature weight must dominate the bias
    assert(w(1) > 0.0 && w(1) > w(0))
    val (score, pred) = Classifier.lrScore(feats, w)
    val acc = df.select(col("y"), pred.as("p"))
      .filter(col("y") === col("p").cast("double")).count()
    assert(acc >= 190, s"accuracy $acc/200") // linear rule recovered
  }

  test("lrTrain: zero rounds returns init; gradients are order-free") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 0.2, 1.0), (2L, 1.0, 0.8, 0.0))
      .toDF("id", "x0", "x1", "y")
    val feats = Seq(col("x0"), col("x1"))
    assert(Classifier.lrTrain(df, feats, col("y"), Seq(0.1, -0.2), 0.5, 0)
      === Seq(0.1, -0.2))
    // same data, different partitioning → identical weights (quantized sums)
    val w1 = Classifier.lrTrain(df.repartition(1), feats, col("y"),
      Seq(0.0, 0.0), 0.5, 3)
    val w4 = Classifier.lrTrain(df.repartition(4), feats, col("y"),
      Seq(0.0, 0.0), 0.5, 3)
    assert(w1 === w4)
  }

  test("conformalCoverage: radius is the ceil-rank calib residual; coverage exact") {
    import spark.implicits._
    // cat 'a': train rows y = 10, 20 -> yhat = 15000 milli.
    // calib rows y = 14, 16, 25 -> errs 1000, 1000, 10000;
    // ceil(0.9*3) = 3 -> radius 10000.
    // eval rows y = 5 (err 10000, covered), 30 (err 15000, not).
    val df = Seq(
      ("a", 10L, 2L), ("a", 20L, 3L),
      ("a", 14L, 0L), ("a", 16L, 0L), ("a", 25L, 0L),
      ("a", 5L, 1L), ("a", 30L, 1L))
      .toDF("cat", "y", "fold")
    val got = Classifier.conformalCoverage(df, "cat", "y", "fold",
      calibFold = 0L, evalFold = 1L, levelPct = 90).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("yhat_milli") === 15000L)
    assert(r.getAs[Long]("n_calib") === 3L)
    assert(r.getAs[Long]("radius_milli") === 10000L)
    assert(r.getAs[Long]("n_eval") === 2L)
    assert(r.getAs[Long]("n_covered") === 1L)
    assert(r.getAs[Long]("coverage_ppm") === 500000L)
  }
}
