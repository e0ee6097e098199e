package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch properties on controlled streams (q93 gates the
  * exact counter table and estimates against DuckDB at corpus scale).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def stream = Seq.tabulate(300)(i => s"tok${i % 7}")
    .toDF("t") // tok0..tok6, counts 43±1

  private def trueCounts = stream.groupBy(col("t"))
    .agg(count(lit(1)).as("true_cnt"))

  test("w=1 degenerates to the total occurrence count") {
    val sk = Sketch.countMin(stream, col("t"), d = 3, w = 1)
    val est = Sketch.estimate(sk, trueCounts, col("t"), d = 3, w = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2))
    assert(est.forall(_._2 === 300L))
  }

  test("estimates upper-bound true counts; more rows never hurt") {
    def estimates(d: Int, w: Int) = {
      val sk = Sketch.countMin(stream, col("t"), d, w)
      Sketch.estimate(sk, trueCounts, col("t"), d, w)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    val e4 = estimates(4, 4) // 7 tokens in 4 buckets: collisions certain
    assert(e4.values.forall { case (truth, est) => est >= truth })
    // perms(1) is a prefix of perms(4) (same fixed seed), so the d=4
    // min ranges over a superset of hash rows: estimates only tighten
    val e1 = estimates(1, 4)
    assert(e4.forall { case (t, (_, est)) => est <= e1(t)._2 })
  }

  test("sketch is bounded by d*w regardless of stream size") {
    val sk = Sketch.countMin(stream, col("t"), d = 3, w = 4).collect()
    assert(sk.length <= 12)
    assert(sk.map(_.getLong(2)).sum === 3L * 300L) // each row counts all
  }
}
