package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedSumCount equals the direct aggregation") {
    import spark.implicits._
    // one hot key (90% of rows) + a few cold keys
    val rows = (1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold${i % 5}", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, "k", col("v"), factor = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("saltedJoin equals the plain join") {
    import spark.implicits._
    val fact = ((1 to 500).map(i => ("hot", i)) ++ Seq(("cold", 1), ("miss", 2)))
      .toDF("k", "payload")
    val build = Seq(("hot", "H"), ("cold", "C"), ("other", "O")).toDF("k", "attr")
    val direct = fact.join(build, Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(fact, build, "k", factor = 4)
      .select("k", "payload", "attr")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    assert(salted.toSeq === direct.toSeq)
  }

  test("salting is deterministic across evaluations") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("k", i.toDouble)).toDF("k", "v")
    val a = Skew.saltedSumCount(df, "k", col("v"), 4).collect().toSeq
    val b = Skew.saltedSumCount(df, "k", col("v"), 4).collect().toSeq
    assert(a === b)
  }
}
