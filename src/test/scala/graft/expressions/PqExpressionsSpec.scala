package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** Native PQ kernels vs the definitional Catalyst trees — the
  * bit-exactness contract that keeps the q121/q483 hash gates valid
  * after the 64 KB-codegen fix (VERDICT r12 item 2).
  */
class PqExpressionsSpec extends SparkSpec {

  // deterministic M=4 × K=5 × sub=3 codebook grid (dim 12)
  private val codebooks: Seq[Seq[Seq[Double]]] =
    (0 until 4).map(mi => (0 until 5).map(c => (0 until 3).map(d =>
      math.sin(mi * 37 + c * 11 + d * 3) * 2.5)))

  private def vecsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val full = (0 until 300).map(i =>
      (i.toLong, Seq.fill(12)(rnd.nextDouble() * 4 - 2)))
    // ragged tails exercise the slice-prefix semantics
    val short = Seq((300L, Seq.fill(7)(rnd.nextDouble())),
      (301L, Seq.empty[Double]))
    (full ++ short).toDF("id", "v")
  }

  test("native encode is bit-identical to the unrolled argmin tree") {
    val portable = array(codebooks.indices.map { mi =>
      Similarity.pqArgminPortable(
        slice(col("v"), mi * 3 + 1, 3), codebooks(mi))
    }: _*)
    val diffs = vecsDf
      .select(col("id"), portable.as("slow"),
        PqExpressions.pqEncode(col("v"), codebooks).as("fast"))
      .filter(not(col("slow") <=> col("fast")))
      .count()
    assert(diffs === 0)
  }

  test("native ADC is bit-identical to the reduce(_ + _) tree") {
    val coded = vecsDf.withColumn("codes",
      PqExpressions.pqEncode(col("v"), codebooks))
    // query residuals = the vectors themselves shifted, codes of OTHER
    // rows — exercises non-self pairs like the serve join does
    val q = coded.select(col("id").as("qid"),
      transform(col("v"), x => x * 0.5 - 0.1).as("qres"))
    val c = coded.select(col("id").as("cid"), col("codes"))
    val diffs = q.join(c, col("qid") =!= col("cid"))
      .filter(col("qid") < 30) // bounded pair set
      .select(
        Similarity.pqAdcPortable(col("qres"), col("codes"), codebooks)
          .as("slow"),
        PqExpressions.pqAdc(col("qres"), col("codes"), codebooks)
          .as("fast"))
      .filter(not(col("slow") <=> col("fast")))
      .count()
    assert(diffs === 0)
  }

  test("interpreted and codegen paths agree; nulls follow the tree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val v = Seq(0.5, -1.0, 2.0, 0.0, 1.5, -0.5, 3.0, 0.25, -2.0, 1.0, 0.75, -0.25)
    val lv = Literal.create(v, ArrayType(DoubleType))
    val enc = PqEncodeCodes(lv, codebooks)
    val codes = enc.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    // codegen path through a DataFrame must match the interpreter
    import spark.implicits._
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(PqExpressions.pqEncode(col("v"), codebooks))
      .collect().head.getSeq[Int](0)
    assert(viaDf === codes)
    // ADC: null code array ⇒ null; valid codes round-trip
    val lc = Literal.create(codes, ArrayType(IntegerType))
    val lnull = Literal.create(null, ArrayType(IntegerType))
    assert(PqAdcDist(lv, lnull, codebooks).eval(null) === null)
    val d = PqAdcDist(lv, lc, codebooks).eval(null).asInstanceOf[Double]
    assert(d >= 0.0)
    val viaDfAdc = Seq((v, codes)).toDF("v", "c")
      .select(PqExpressions.pqAdc(col("v"), col("c"), codebooks))
      .collect().head.getDouble(0)
    assert(viaDfAdc === d)
  }

  test("encode of own residual is the self-cell: ADC to own code ≤ others") {
    // for each vector, the distance to its own encoding never exceeds
    // the distance to any other row's encoding of the SAME subspace
    // argmin family — the defining property of nearest-centroid codes
    val coded = vecsDf.filter(col("id") < 50).withColumn("codes",
      PqExpressions.pqEncode(col("v"), codebooks))
    val self = coded.select(col("id").as("qid"), col("v").as("qv"),
      col("codes").as("own"))
    val bad = self
      .crossJoin(coded.select(col("codes").as("other")))
      .filter(
        PqExpressions.pqAdc(col("qv"), col("own"), codebooks) >
          PqExpressions.pqAdc(col("qv"), col("other"), codebooks))
      .count()
    assert(bad === 0)
  }
}
