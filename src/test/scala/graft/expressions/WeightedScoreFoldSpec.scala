package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.License

/** Bit-identity of the native A9 fold vs the interpreted HOF
  * recurrence it replaces (the DotProductF discipline: the fast path
  * must be provably the same function, or it can't sit under the
  * oracle gate).
  */
class WeightedScoreFoldSpec extends SparkSpec {

  test("native fold is bit-identical to the HOF recurrence") {
    import spark.implicits._
    // fixed-seed fuzz: 200 lists over magnitudes that stress the
    // recurrence (tiny, huge, negative, subnormal-adjacent)
    val rnd = new scala.util.Random(20260812L)
    val lists = (0 until 200).map { i =>
      (i.toLong, List.fill(rnd.nextInt(12))(
        (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(19) - 9)))
    }
    val both = lists.toDF("id", "scores").select(
      License.runningWeightedScore(col("scores")).as("hof"),
      WeightedScoreFold.scoreF(col("scores")).as("native"))
      .collect()
    both.foreach { r =>
      // raw-bits compare: 0.0 vs -0.0 and any NaN payload both caught
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: null element nulls, empty is the 0.0 seed") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0)),
      (2L, Seq.empty[java.lang.Double]),
      (3L, null)
    ).toDF("id", "scores")
    val out = df.select(col("id"),
        WeightedScoreFold.scoreF(col("scores")).as("s"),
        License.runningWeightedScore(col("scores")).as("hof"))
      .orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ===
      Seq(null, 0.0, null))
    // the HOF form agrees on every case
    assert(out.map(_.isNullAt(1)).toSeq === out.map(_.isNullAt(2)).toSeq)
  }

  test("concrete recurrence values") {
    // ((0*0)+2)*12.5/1 = 25; ((25*1)+4)*12.5/2 = 181.25
    import spark.implicits._
    val df = Seq(Tuple1(Seq(2.0, 4.0))).toDF("scores")
    assert(df.select(WeightedScoreFold.scoreF(col("scores"))).head.getDouble(0)
      === 181.25)
  }
}
