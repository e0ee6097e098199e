package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.FixedPoint

class LnPpmFxSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = (for {
    num <- Seq(1L, 2L, 3L, 7L, 100L, 999L, 65536L, 1000003L,
      (1L << 32) + 17L)
    den <- Seq(1L, 2L, 5L, 97L, 12345L) if num >= den
  } yield (num, den)).toSeq

  test("native kernel equals the portable fold bit-for-bit") {
    val df = pairs.toDF("num", "den")
      .select(col("num"), col("den"),
        FixedPoint.lnPpm(col("num"), col("den")).as("native"),
        FixedPoint.lnPpmPortable(col("num"), col("den")).as("portable"))
    assert(df.filter(col("native") =!= col("portable")).count() === 0)
  }

  test("codegen and interpreted paths agree; JVM helper matches") {
    val got = pairs.toDF("num", "den")
      .select(FixedPoint.lnPpm(col("num"), col("den")))
      .collect().map(_.getLong(0)).toSeq
    pairs.zip(got).foreach { case ((n, d), g) =>
      assert(g === LnPpmUtil.lnPpm(n, d), s"ln($n/$d)")
      // accuracy envelope vs the float log
      val exact = math.log(n.toDouble / d) * 1e6
      assert(g <= exact + 1 && g >= exact - exact.abs * 1e-4 - 3)
    }
  }

  test("null propagates; type mismatch rejected at analysis") {
    val n = Seq((Option.empty[Long], 2L)).toDF("num", "den")
      .select(FixedPoint.lnPpm(col("num"), col("den")))
      .collect().head
    assert(n.isNullAt(0))
  }
}
