package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkSpec {

  test("native dot is bit-identical to the portable aggregate(zip_with) path") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib")).limit(500)
    val diffs = pairs.select(
        Similarity.dot(col("a"), col("b")).as("portable"),
        VectorExpressions.dotF(col("a"), col("b")).as("native"))
      .filter(col("portable") =!= col("native"))
      .count()
    assert(diffs === 0)
  }

  test("null handling: null array → null, null element → contributes 0") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
        Row(null, Seq(1.0f)),
        Row(Seq(1.0f, null), Seq(5.0f, 7.0f))),
      schema)
    val got = df.select(VectorExpressions.dotF(col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(11.0), None, Some(5.0)))
  }

  test("interpreted and codegen paths agree") {
    import spark.implicits._
    val a = Seq(1.5f, -2.5f, 3.0f)
    val b = Seq(2.0f, 4.0f, -1.0f)
    val expected = 1.5 * 2.0 + -2.5 * 4.0 + 3.0 * -1.0
    // codegen path via collect()
    val df = Seq((a, b)).toDF("a", "b")
    val v = df.select(VectorExpressions.dotF(col("a"), col("b"))).collect()
      .head.getDouble(0)
    assert(v === expected)
    // interpreted path: direct nullSafeEval on catalyst literals
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val la = Literal.create(a, ArrayType(FloatType))
    val lb = Literal.create(b, ArrayType(FloatType))
    assert(DotProductF(la, lb).eval(null) === expected)
    // mixed float/double inputs through the interpreter too
    val ld = Literal.create(b.map(_.toDouble), ArrayType(DoubleType))
    assert(DotProductF(la, ld).eval(null) === expected)
  }

  test("dotI equals the portable integer fold; codegen == interpreted") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(64)(rnd.nextInt(255) - 127), Seq.fill(64)(rnd.nextInt(255) - 127))
    } :+ ((Seq.empty[Int], Seq.empty[Int]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorExpressions.dotI(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x * y).cast("long")),
        lit(0L), (acc, x) => acc + x).as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val la = Literal.create(Seq(1, -2, 127), ArrayType(IntegerType))
    val lb = Literal.create(Seq(3, 4, 127), ArrayType(IntegerType))
    assert(DotProductI(la, lb).eval(null) === (3L - 8L + 127L * 127L))
    // null input propagates; max-magnitude products don't overflow
    assert(DotProductI(Literal.create(null, ArrayType(IntegerType)), lb)
      .eval(null) === null)
  }

  test("l2sqF: bit-identical to the portable fold; nulls read as 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextGaussian().toFloat),
      Seq.fill(16)(rnd.nextGaussian())))
    val df = rows.toDF("a", "c")
    val got = df.select(
      VectorExpressions.l2sqF(col("a"), col("c")).as("fast"),
      aggregate(zip_with(col("a"), col("c"), (x, c) => {
        val xd = coalesce(x.cast("double"), lit(0.0d))
        (xd - c) * (xd - c)
      }), lit(0.0d), (acc, x) => acc + x).as("slow"))
      .collect()
    got.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    // null element reads as 0 → contributes (0 - c)^2
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val la = Literal.create(Seq[java.lang.Double](null, 1.0),
      ArrayType(DoubleType))
    val lc = Literal.create(Seq(3.0, 1.0), ArrayType(DoubleType))
    assert(L2DistSqF(la, lc).eval(null) === 9.0)
    assert(L2DistSqF(Literal.create(null, ArrayType(DoubleType)), lc)
      .eval(null) === null)
  }

  test("hammingW: identical to the portable xor/bit_count fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(8L)
    val rows = Seq.fill(50)((
      Seq.fill(2)(rnd.nextLong()), Seq.fill(2)(rnd.nextLong())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorExpressions.hammingW(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
        lit(0L), (acc, x) => acc + x).as("slow"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val la = Literal.create(Seq(-1L), ArrayType(LongType))
    val lb = Literal.create(Seq(0L), ArrayType(LongType))
    assert(HammingWords(la, lb).eval(null) === 64L)
    assert(HammingWords(Literal.create(null, ArrayType(LongType)), lb)
      .eval(null) === null)
  }

  test("GraftExtensions injects a 2-arg graft_dot builder") {
    // the extensions object applies cleanly to a fresh container
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the builder itself enforces arity + constructs the expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = GraftExtensions.dotBuilder(Seq(Literal(1), Literal(2)))
    assert(e.isInstanceOf[DotProductF])
    intercept[IllegalArgumentException] {
      GraftExtensions.dotBuilder(Seq(Literal(1)))
    }
  }
}
