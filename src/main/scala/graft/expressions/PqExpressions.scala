package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels (Jégou et al. 2011).
  *
  * The portable formulation in [[graft.operators.Similarity]] unrolls
  * PQ as literal Catalyst trees — per subspace an
  * `array_min(array(struct(l2sq, id) × K))` argmin, and the ADC
  * distance as a `reduce(_ + _)` over M such terms. Correct, but at
  * M=8 × K=16 the single projection holds 128 inlined `l2sq` calls
  * plus the literal centroid arrays and the generated method blows the
  * JVM's 64 KB bytecode limit (VERDICT r12 item 2: q483 compiled to
  * `InternalCompilerException: Code grows beyond 64 KB`, fell back to
  * INTERPRETED evaluation, and dumped a full stacktrace+plan per
  * attempt). At production PqM×PqK the unrolled tree only grows — the
  * exact query whose point is scan speed must never run interpreted.
  *
  * These expressions carry the codebooks as instance fields (the
  * [[DictionaryMatches]] reference-object discipline): the generated
  * code is ONE virtual call per row, the codegen span stays tiny, and
  * the inner loop is a primitive double loop over flat arrays.
  *
  * Bit-exactness contract (asserted in PqExpressionsSpec against the
  * portable trees, which remain the oracle-replayable definition):
  *  - per-subspace distance = [[L2DistSqF]] over
  *    `slice(vec, mi·sub+1, sub)` vs the centroid: left-to-right
  *    `acc += d*d` fold from +0.0 over the COMMON PREFIX of the slice
  *    and the centroid, null elements read as 0.0;
  *  - argmin ties to the LOWER cell id under Spark's total double
  *    order (NaN greatest) — `array_min(struct(d, i))` semantics;
  *  - the ADC total preserves the `reduce(_ + _)` association: each
  *    subspace term is summed to completion, THEN added left-to-right
  *    — a flat fused loop would re-associate the doubles and break
  *    hash gates.
  */
private[expressions] final class PqCodebook(
    val codebooks: Seq[Seq[Seq[Double]]]) extends Serializable {
  val m: Int = codebooks.size
  val k: Int = codebooks.head.size
  val sub: Int = codebooks.head.head.size
  require(m >= 1 && k >= 1 && sub >= 1 &&
    codebooks.forall(cb => cb.size == k && cb.forall(_.size == sub)),
    "codebooks must be a non-empty M x K x sub grid")
  /** Flat row-major copy: centroid (mi, cell) starts at
    * ((mi·k)+cell)·sub.
    */
  val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var i = 0
    for (cb <- codebooks; c <- cb; d <- c) { a(i) = d; i += 1 }
    a
  }

  @inline private def get(vec: ArrayData, i: Int, isDouble: Boolean): Double =
    if (vec.isNullAt(i)) 0.0d
    else if (isDouble) vec.getDouble(i)
    else vec.getFloat(i).toDouble

  /** L2DistSqF(slice(vec, mi·sub+1, sub), centroid) — identical fold. */
  private def subDist(vec: ArrayData, vecLen: Int, isDouble: Boolean,
      mi: Int, cell: Int): Double = {
    val off = mi * sub
    val n = math.min(math.max(vecLen - off, 0), sub)
    val base = (mi * k + cell) * sub
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val d = get(vec, off + i, isDouble) - flat(base + i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Nearest cell per subspace; ties (and NaN, per Spark's total
    * double order) resolve exactly as `array_min(struct(d, i))`.
    */
  def encode(vec: ArrayData, isDouble: Boolean): GenericArrayData = {
    val vecLen = vec.numElements()
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = subDist(vec, vecLen, isDouble, mi, 0)
      var bestI = 0
      var c = 1
      while (c < k) {
        val d = subDist(vec, vecLen, isDouble, mi, c)
        if (java.lang.Double.compare(d, best) < 0) { best = d; bestI = c }
        c += 1
      }
      codes(mi) = bestI
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Σ_m ‖q_m − codebook_m[code_m]‖², association preserved; null
    * semantics of the portable tree: a missing/null code nulls the
    * WHOLE distance (element_at(lit, null) → null → l2sq null → the
    * `+` chain nulls), surfaced here as a null return.
    */
  def adc(qres: ArrayData, codes: ArrayData, isDouble: Boolean): Any = {
    if (codes.numElements() < m) return null
    val vecLen = qres.numElements()
    var acc = 0.0d
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val cell = codes.getInt(mi)
      if (cell < 0 || cell >= k) return null
      acc += subDist(qres, vecLen, isDouble, mi, cell)
      mi += 1
    }
    acc
  }
}

/** `array<float|double> → array<int>`: the M per-subspace
  * nearest-centroid PQ codes, computed at scan speed with the
  * codebook grid as an instance field. Null input ⇒ null.
  */
case class PqEncodeCodes(child: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  @transient private lazy val cb = new PqCodebook(codebooks)
  private def isDoubleArr = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<float|double> input, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    cb.encode(input.asInstanceOf[ArrayData], isDoubleArr)

  /** Public trampoline for the generated code. */
  def doEncode(input: ArrayData): GenericArrayData =
    cb.encode(input, isDoubleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this,
      classOf[PqEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.doEncode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeCodes = copy(child = newChild)
}

/** `(array<float|double> qres, array<int> codes) → double`: the
  * asymmetric PQ distance Σ_m ‖q_m − codebook_m[code_m]‖² with the
  * `reduce(_ + _)`-over-subspace association preserved. Null input or
  * a null/out-of-range code ⇒ null (the portable tree's semantics).
  */
case class PqAdcDist(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  @transient private lazy val cb = new PqCodebook(codebooks)
  private def isDoubleArr = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
          ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc requires (array<float|double>, array<int>), " +
          s"got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    cb.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], isDoubleArr)

  /** Public trampoline for the generated code; null boxed as needed. */
  def doAdc(qres: ArrayData, codes: ArrayData): java.lang.Double =
    cb.adc(qres, codes, isDoubleArr) match {
      case null => null
      case d: Double => java.lang.Double.valueOf(d)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDist].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val boxed = ctx.freshName("adc")
      s"""
         |java.lang.Double $boxed = $ref.doAdc($q, $c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: per-subspace PQ codes of `vec`. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncodeCodes(Bridge.expression(vec), codebooks))

  /** Column API: ADC distance of exact `qres` against PQ `codes`. */
  def pqAdc(qres: Column, codes: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqAdcDist(Bridge.expression(qres),
      Bridge.expression(codes), codebooks))
}
