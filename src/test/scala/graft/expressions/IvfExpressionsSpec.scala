package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** Native coarse-quantizer kernels vs the definitional literal trees —
  * the contract that lets every IVF gate keep its hash after the
  * assignment/lookup swap (the q483 discipline, one layer down).
  */
class IvfExpressionsSpec extends SparkSpec {

  // sparse ids on purpose: trained quantizers drop empty cells
  private val cents: Seq[(Int, Seq[Double])] = Seq(
    0 -> Seq(1.0, 0.25, -0.5, 2.0),
    2 -> Seq(-1.5, 1.0, 0.0, 0.75),
    3 -> Seq(0.1, -0.1, 1.25, -2.0),
    7 -> Seq(2.0, 2.0, 2.0, 2.0),
    11 -> Seq(-0.3, 0.9, -1.1, 0.4))

  private def vecsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val rows = (0 until 400).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble() * 4 - 2))) ++ Seq(
      (400L, Seq(0.0, 0.0, 0.0, 0.0)), // zero vector → guard path
      (401L, Seq(1.0, 0.25, -0.5, 2.0)), // exactly centroid 0
      (402L, Seq(2.0)), // short
      (403L, Seq.empty[Double]),
      (404L, null.asInstanceOf[Seq[Double]])) // NULL vector → NULL cell
    rows.toDF("id", "v")
  }

  test("NULL input vector yields NULL in both formulations") {
    val rows = vecsDf.filter(col("id") === 404L).select(
        Similarity.assignCellPortable(col("v"), cents).as("slow1"),
        IvfExpressions.nearestCells(col("v"), cents, 1).as("fast1"),
        Similarity.assignCellsPortable(col("v"), cents, 3).as("slow3"),
        IvfExpressions.nearestCells(col("v"), cents, 3).as("fast3"))
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    (0 until 4).foreach(i => assert(r.isNullAt(i), s"col $i not null"))
  }

  test("nearestCells(1) is bit-identical to the array_max argmax tree") {
    val diffs = vecsDf.select(
        Similarity.assignCellPortable(col("v"), cents).as("slow"),
        IvfExpressions.nearestCells(col("v"), cents, 1).getItem(0)
          .as("fast"))
      .filter(not(col("slow") <=> col("fast")))
      .count()
    assert(diffs === 0)
  }

  test("nearestCells(p) matches the reverse(array_sort) probe list") {
    for (p <- Seq(2, 3, 5)) {
      val diffs = vecsDf.select(
          Similarity.assignCellsPortable(col("v"), cents, p).as("slow"),
          IvfExpressions.nearestCells(col("v"), cents, p).as("fast"))
        .filter(not(col("slow") <=> col("fast")))
        .count()
      assert(diffs === 0, s"probe list diverged at p=$p")
    }
  }

  test("cellCentroid matches the when-chain; unknown id → null") {
    import spark.implicits._
    val ids = Seq(0, 2, 3, 7, 11, 1, 99, -5).toDF("cell")
      .withColumn("cell", col("cell").cast("int"))
    val diffs = ids.select(
        Similarity.centOfPortable(col("cell"), cents).as("slow"),
        IvfExpressions.cellCentroid(col("cell"), cents).as("fast"))
      .filter(not(col("slow") <=> col("fast")))
      .count()
    assert(diffs === 0)
  }

  test("interpreted == codegen; float input widens like the tree") {
    import spark.implicits._
    val f = Seq((1L, Seq(1.0f, 0.25f, -0.5f, 2.0f)),
      (2L, Seq(-1.0f, 0.1f, 0.2f, 0.3f))).toDF("id", "v")
    val viaDf = f.select(
      IvfExpressions.nearestCells(col("v"), cents, 2).as("fast"),
      Similarity.assignCellsPortable(col("v"), cents, 2).as("slow"))
      .collect()
    viaDf.foreach(r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
    // interpreted path directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val lv = Literal.create(Seq(1.0, 0.25, -0.5, 2.0), ArrayType(DoubleType))
    val got = NearestCells(lv, cents, 1).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    assert(got === Seq(0)) // its own centroid wins
  }

  test("scales where the literal tree cannot: nlist = 4096") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val big = (0 until 4096).map(i =>
      i -> Seq.fill(4)(rnd.nextDouble() * 2 - 1))
    val df = Seq((1L, Seq(0.5, -0.5, 0.25, 1.0))).toDF("id", "v")
    val cell = df.select(
        IvfExpressions.nearestCells(col("v"), big, 3).as("c"))
      .collect().head.getSeq[Int](0)
    assert(cell.size === 3 && cell.distinct.size === 3)
    // brute-force check in Scala with the same fold/order
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dab = a.zip(b).map { case (x, y) => x * y }
        .foldLeft(0.0)(_ + _)
      val na = math.sqrt(a.map(x => x * x).foldLeft(0.0)(_ + _))
      val nb = math.sqrt(b.map(x => x * x).foldLeft(0.0)(_ + _))
      if (na * nb == 0.0) 0.0 else dab / (na * nb)
    }
    val q = Seq(0.5, -0.5, 0.25, 1.0)
    val exp = big.map { case (i, c) => (cos(q, c), i) }
      .sortBy { case (s, i) => (-s, -i) }.take(3).map(_._2)
    assert(cell === exp)
  }
}
