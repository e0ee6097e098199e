package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextAnalysis

class Md5Hash60Spec extends SparkSpec {

  test("native md5h60 equals the portable conv(substr(md5)) on corpus text") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextAnalysis.shingles(col("text"), 3)).as("s"))
    val diffs = d.select(
        TextAnalysis.hash60(col("s")).as("portable"),
        Md5Hash60.hash60Native(col("s")).as("native"))
      .filter(col("portable") =!= col("native"))
      .count()
    assert(diffs === 0)
  }

  test("edge values: empty string, unicode, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("héllo ∀"), None).toDF("s")
    val got = df.select(TextAnalysis.hash60(col("s")).as("p"),
        Md5Hash60.hash60Native(col("s")).as("n"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
                 if (r.isNullAt(1)) None else Some(r.getLong(1))))
    got.foreach { case (p, n) => assert(p === n) }
    assert(got(2)._2 === None)
  }
}
