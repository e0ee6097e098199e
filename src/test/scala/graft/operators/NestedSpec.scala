package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NestedSpec extends SparkSpec {

  test("moduleByName: first match by name, null when absent") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(("QOS", 5), ("firewall", 7), ("QOS", 9))),
      (2, Seq(("WAN", 1))),
      (3, Seq.empty[(String, Int)])
    ).toDF("id", "raw")
      .select(col("id"), transform(col("raw"),
        x => struct(x.getField("_1").as("name"), x.getField("_2").as("v"))).as("modules"))

    val got = df.select(col("id"),
        Nested.moduleByName(col("modules"), "name", "QOS").getField("v").as("v"))
      .orderBy("id").collect().map(r => (r.getInt(0), Option(r.get(1))))
    assert(got.toSeq === Seq((1, Some(5)), (2, None), (3, None)))
  }

  test("nestedCount flattens two levels; existsAny; fillNullZero; arraySum") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(Seq(1, 2), Seq(3)), Seq(Some(1), None, Some(3))),
      (2, Seq.empty[Seq[Int]], Seq.empty[Option[Int]])
    ).toDF("id", "nested", "arr")

    val got = df.select(
        col("id"),
        Nested.nestedCount(col("nested")).as("n"),
        Nested.existsAny(col("arr"), _ > 2).as("any_gt2"),
        Nested.fillNullZero(col("arr")).as("filled"),
        Nested.arraySum(col("arr").cast("array<double>"), lit(0.0d)).as("sum"))
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2),
                 r.getSeq[Int](3).toList, r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1, 3, true, List(1, 0, 3), 4.0),
      (2, 0, false, Nil, 0.0)))
  }

  test("explodeBridge: positions and outer-explode of empty arrays") {
    import spark.implicits._
    val df = Seq((10, Seq("a", "b")), (20, Seq.empty[String])).toDF("k", "ids")
    val got = Nested.explodeBridge(df, Seq("k"), col("ids"), "id")
      .orderBy("k", "pos").collect()
      .map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq === Seq(
      (10, Some(0), Some("a")), (10, Some(1), Some("b")),
      (20, None, None)))
  }

  test("elementwiseSum groups by position") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (2, Seq(5.0f, 6.0f)))
      .toDF("label", "vec")
    val got = Nested.elementwiseSum(df, "label", col("vec"), _.cast("double"))
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1, 0, 4.0), (1, 1, 6.0), (2, 0, 5.0), (2, 1, 6.0)))
  }

  test("elementwiseSumZip truncates ragged series to the shortest (Python zip)") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0f, 2.0f, 9.0f)), (1, Seq(3.0f, 4.0f)))
      .toDF("label", "vec")
    val got = Nested.elementwiseSumZip(df, "label", col("vec"), _.cast("double"))
      .orderBy("pos").collect()
      .map(r => (r.getInt(1), r.getDouble(2)))
    // position 2 (the longer series' tail) is DROPPED, like zip
    assert(got.toSeq === Seq((0, 4.0), (1, 6.0)))
  }

  test("zero-norm vectors score cosine 0, never NaN rank-1") {
    import spark.implicits._
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val c = df.select(
        graft.operators.Similarity.cosine(col("a"), col("b")).as("p"),
        graft.operators.Similarity.cosineNative(col("a"), col("b")).as("n"))
      .collect().head
    assert(c.getDouble(0) === 0.0)
    assert(c.getDouble(1) === 0.0)
  }
}
