package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

class WordShinglesSpec extends SparkSpec {

  test("native shingles equal the portable chain over the corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(1, 3)) {
      val diffs = d.select(
          TextAnalysis.shingles(col("text"), n).as("p"),
          WordShingles.shinglesNative(col("text"), n).as("nv"))
        .filter(col("p") =!= col("nv"))
        .count()
      assert(diffs === 0, s"n=$n")
    }
  }

  test("edge cases: empty, short, multi-space, mixed case") {
    import spark.implicits._
    val df = Seq("", "   ", "One", "a  B\tc", "x y z w").toDF("s")
    val got = df.select(
        TextAnalysis.shingles(col("s"), 3).as("p"),
        WordShingles.shinglesNative(col("s"), 3).as("nv"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString)
    }
    // spot-check values
    assert(got(3).getSeq[String](1) === Seq("a b c"))
    assert(got(4).getSeq[String](1) === Seq("x y z", "y z w"))
  }
}
