package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zKey interleaves bits (y odd positions, x even)") {
    // x=3 (011), y=5 (101) → y2 x2 y1 x1 y0 x0 = 100111b = 39
    val rows = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L))
      .toDF("x", "y")
      .select(ZOrder.zKey(col("x"), col("y"), 3)).as[Long].collect().toSeq
    assert(rows == Seq(39L, 0L, 21L, 42L)) // 010101b, 101010b
  }

  test("zKey is a bijection on the grid") {
    val keys = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(ZOrder.zKey(col("x"), col("y"), 5)).as[Long].collect()
    assert(keys.distinct.length === 1024)
    assert(keys.min === 0L && keys.max === 1023L)
  }

  test("z-ordering tightens per-chunk min/max stats on BOTH dimensions") {
    // data skipping prunes on footer min/max per file chunk: 64-row
    // chunks of the z-sorted grid are exact 8×8 tiles (x-span + y-span
    // = 14), while row-major chunks are full 1×64 columns (span 63) —
    // a predicate on y prunes nothing there
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
    def meanChunkSpan(sorted: Seq[(Long, Long)]): Double =
      sorted.grouped(64).map { c =>
        val xs = c.map(_._1); val ys = c.map(_._2)
        ((xs.max - xs.min) + (ys.max - ys.min)).toDouble
      }.sum / (sorted.length / 64)
    val byZ = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zKey(col("x"), col("y"), 6))
      .orderBy(col("z")).select("x", "y").as[(Long, Long)].collect().toSeq
    val rowMajor = pts.sortBy { case (x, y) => (x, y) }
    assert(meanChunkSpan(byZ) === 14.0) // exact 8×8 tiles
    assert(meanChunkSpan(rowMajor) === 63.0)
  }
}
