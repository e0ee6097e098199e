package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Rolling update ≡ definitional hash on every window, plus the
  * codegen/interpreted split and the length edges.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private val B = 131L
  private val M = 1000000007L
  private def naive(s: String, k: Int): Seq[Long] =
    (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((a, c) => (a * B + c) % M)
    }

  test("hand-computed windows and rolling ≡ naive on fuzzed strings") {
    assert(naive("abcd", 2) === Seq(97L * 131 + 98, 98L * 131 + 99,
      99L * 131 + 100))
    val rnd = new scala.util.Random(20260814L)
    val cases = Seq("", "a", "abcd", "aaaaaaaaaaaaaaaaaaaa") ++
      (0 until 50).map(_ => rnd.alphanumeric.take(
        1 + rnd.nextInt(60)).mkString)
    for (k <- Seq(1, 2, 16)) {
      val got = cases.toDF("s")
        .select(col("s"), RollingHash.rollingNative(col("s"), k).as("h"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      cases.foreach { s =>
        val want = if (s.length < k) Seq.empty[Long] else naive(s, k)
        assert(got(s) === want, s"k=$k s='$s'")
      }
    }
  }

  test("null propagates; interpreted eval matches") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(RollingHash.rollingNative(col("s"), 4).as("h"))
      .collect().head
    assert(r.isNullAt(0))
    val e = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "abcdef", org.apache.spark.sql.types.StringType), 3)
    val out = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray.toSeq
    assert(out === naive("abcdef", 3))
  }
}
