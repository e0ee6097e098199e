package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product.
  *
  * The portable formulation (`Similarity.dot`: `aggregate(zip_with(…))`)
  * evaluates its lambda per element through the interpreter — fine for
  * correctness gates, but the hot loop of brute-force similarity
  * search at 100 TB deserves whole-stage codegen. This expression
  * compiles to a primitive `double` loop over the two `ArrayData`
  * buffers: no lambda dispatch, no per-element boxing.
  *
  * Semantics match `Similarity.dot` exactly: elements are widened
  * float→double and accumulated left-to-right from +0.0, so results
  * are bit-identical to the portable path (asserted in
  * VectorExpressionsSpec) and therefore to the DuckDB oracles.
  * Mismatched lengths evaluate the overlapping prefix (zip_with would
  * null-pad; callers guard equal dims). Null input ⇒ null.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isDoubleArr(e: Expression) = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (la, rb) = (isDoubleArr(left), isDoubleArr(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      // null elements contribute 0 (zip_with x*y with null would null
      // the product; fillNullZero upstream is the documented contract)
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (la) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (rb) b.getDouble(i) else b.getFloat(i).toDouble
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def getter(arr: String, idx: String, isD: Boolean) =
        if (isD) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${getter(a, i, isDoubleArr(left))} * ${getter(b, i, isDoubleArr(right))};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Native INTEGER dot product — the int8-ANN serving analog of
  * [[DotProductF]]: `array<int> × array<int> → long`, accumulated
  * left-to-right from 0L with each product widened to long. Exact by
  * construction (integers — no float ordering concerns); the win over
  * the portable `aggregate(zip_with(...))` form is the same one
  * DotBench measured for doubles: a primitive loop inside whole-stage
  * codegen instead of two interpreted lambdas per candidate pair.
  * Null ELEMENTS contribute 0 (the [[DotProductF]] contract); null
  * input ⇒ null.
  */
case class DotProductI(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_int requires array<int> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API over the native expression. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** Column API over the native integer dot. */
  def dotI(a: Column, b: Column): Column =
    Bridge.column(DotProductI(Bridge.expression(a), Bridge.expression(b)))

  /** RAW cosine from the native dot (0/0 ⇒ NaN on zero vectors) —
    * production paths use [[graft.operators.Similarity.cosineNative]],
    * which adds the zero-norm guard.
    */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }
}
