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

  /** Driver-side reference xy2d (the classic per-bit rotate fold) —
    * the independent implementation the column fold is checked
    * against.
    */
  private def xy2dRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertKey matches the reference xy2d on the full 16×16 grid") {
    val pts = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.hilbertKey(col("x"), col("y"), 4).as("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) => assert(d === xy2dRef(4, x, y)) }
  }

  test("hilbertKey is a bijection and consecutive keys are grid neighbors") {
    val pts = for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.hilbertKey(col("x"), col("y"), 5).as("d"))
      .as[(Long, Long, Long)].collect()
    val ds = got.map(_._3)
    assert(ds.distinct.length === 1024 && ds.min === 0L && ds.max === 1023L)
    // the property z-order lacks: every consecutive index pair is a
    // single grid step (no domain jumps), which is WHY equal-width
    // hilbert buckets are spatially compact
    val pos = got.map { case (x, y, d) => d -> (x, y) }.toMap
    (0L until 1023L).foreach { d =>
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L)
    }
  }

  test("hilbert equal-width buckets span tighter rectangles than z on the mid band") {
    // 16 equal-width key buckets over the 64×64 grid: max bucket
    // bounding-box area under hilbert ≤ under z (the q470 layout
    // claim in its unit form)
    val pts = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def maxArea(keyed: org.apache.spark.sql.DataFrame): Long =
      keyed.withColumn("b", (col("k") / 256L).cast("long"))
        .groupBy(col("b"))
        .agg(((max(col("x")) - min(col("x")) + 1L) *
          (max(col("y")) - min(col("y")) + 1L)).as("area"))
        .agg(max(col("area"))).head().getLong(0)
    val h = maxArea(pts.withColumn("k",
      ZOrder.hilbertKey(col("x"), col("y"), 6)))
    val z = maxArea(pts.withColumn("k",
      ZOrder.zKey(col("x"), col("y"), 6)))
    assert(h <= z)
    assert(h === 256L) // exact 16×16 tiles — perfectly compact
  }

  test("zKey3 is a bijection onto [0, 8^bits) with per-axis bit lanes") {
    val pts = for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x.toLong, y.toLong, z.toLong)
    val got = pts.toDF("x", "y", "z")
      .select(ZOrder.zKey3(col("x"), col("y"), col("z"), 3).as("k"))
      .as[Long].collect()
    assert(got.distinct.length === 512 && got.min === 0L && got.max === 511L)
    // axis-only moves touch only that axis's bit lane (x sits at
    // positions 3i+2 — the y/z lanes must stay clear)
    val yzLanes = (0 until 3).map(i => 3L << (3 * i)).sum
    assert(pts.toDF("x", "y", "z")
      .select((ZOrder.zKey3(col("x"), lit(0L), lit(0L), 3)
        .bitwiseAND(yzLanes) =!= 0L).as("leak"))
      .as[Boolean].collect().forall(!_))
  }

  test("hilbert3Key is a bijection and consecutive keys are grid neighbors") {
    // THE Hilbert property in 3-D: a bijection [0, 8^bits) → grid
    // where every consecutive index pair differs by exactly one unit
    // step along exactly one axis — verified exhaustively on the
    // 16×16×16 grid (4096 cells)
    val pts = for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x.toLong, y.toLong, z.toLong)
    val got = pts.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.hilbert3Key(col("x"), col("y"), col("z"), 4).as("d"))
      .as[(Long, Long, Long, Long)].collect()
    val ds = got.map(_._4)
    assert(ds.distinct.length === 4096 && ds.min === 0L && ds.max === 4095L)
    val pos = got.map { case (x, y, z, d) => d -> (x, y, z) }.toMap
    (0L until 4095L).foreach { d =>
      val (x1, y1, z1) = pos(d); val (x2, y2, z2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) +
        math.abs(z1 - z2) === 1L, s"jump at d=$d")
    }
  }

  test("hilbert3 equal-width buckets span tighter boxes than 3-axis morton") {
    // 8 equal-width key buckets over the 16³ grid: max bucket
    // bounding-box VOLUME under hilbert3 ≤ under zKey3, and exactly
    // the perfect 16×16×2... no — 8 buckets of 512 cells each are
    // perfect 8×8×8 octants on a Hilbert curve
    val pts = (for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    def maxVol(keyed: org.apache.spark.sql.DataFrame): Long =
      keyed.withColumn("b", (col("k") / 512L).cast("long"))
        .groupBy(col("b"))
        .agg(((max(col("x")) - min(col("x")) + 1L) *
          (max(col("y")) - min(col("y")) + 1L) *
          (max(col("z")) - min(col("z")) + 1L)).as("vol"))
        .agg(max(col("vol"))).head().getLong(0)
    val h = maxVol(pts.withColumn("k",
      ZOrder.hilbert3Key(col("x"), col("y"), col("z"), 4)))
    val z = maxVol(pts.withColumn("k",
      ZOrder.zKey3(col("x"), col("y"), col("z"), 4)))
    assert(h <= z)
    assert(h === 512L) // perfect 8×8×8 octants
  }
}
