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

/** Native squared-L2 distance — the PQ distance kernel:
  * `array<float|double> × array<float|double> → double`, accumulated
  * left-to-right from +0.0 as (x−y)·(x−y) per element. Null ELEMENTS
  * read as 0.0 on either side (the oracle's `coalesce(x, 0)` at the
  * vector definition — for a DIFFERENCE a null must become 0 and
  * still contribute (0−y)², unlike the product case where skipping
  * equals zeroing). Bit-identical to the portable
  * `aggregate(zip_with(…))` fold (VectorExpressionsSpec); null input
  * ⇒ null.
  */
case class L2DistSqF(left: Expression, right: Expression)
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
      s"graft_l2sq requires array<float|double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (la, rb) = (isDoubleArr(left), isDoubleArr(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x =
        if (a.isNullAt(i)) 0.0d
        else if (la) a.getDouble(i) else a.getFloat(i).toDouble
      val y =
        if (b.isNullAt(i)) 0.0d
        else if (rb) b.getDouble(i) else b.getFloat(i).toDouble
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      def getter(arr: String, idx: String, isD: Boolean) =
        if (isD) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${getter(a, i, isDoubleArr(left))};
         |  double $y = $b.isNullAt($i) ? 0.0 : ${getter(b, i, isDoubleArr(right))};
         |  double $d = $x - $y;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistSqF =
    copy(left = newLeft, right = newRight)
}

/** Native Hamming distance over packed sign words:
  * `array<bigint> × array<bigint> → long`, Σ Long.bitCount(x ^ y)
  * over the common prefix. Null ELEMENTS read as 0L words (packed
  * codes are never null in practice; the spec asserts identity with
  * the portable `aggregate(zip_with(bit_count(xor)))` fold on
  * null-free arrays). Null input ⇒ null.
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming requires array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0L else a.getLong(i)
      val y = if (b.isNullAt(i)) 0L else b.getLong(i)
      acc += java.lang.Long.bitCount(x ^ y)
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
         |  long ${acc}_x = $a.isNullAt($i) ? 0L : $a.getLong($i);
         |  long ${acc}_y = $b.isNullAt($i) ? 0L : $b.getLong($i);
         |  $acc += java.lang.Long.bitCount(${acc}_x ^ ${acc}_y);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingWords =
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

  /** Column API over the native squared-L2 distance. */
  def l2sqF(a: Column, b: Column): Column =
    Bridge.column(L2DistSqF(Bridge.expression(a), Bridge.expression(b)))

  /** Column API over the native packed-word Hamming distance. */
  def hammingW(a: Column, b: Column): Column =
    Bridge.column(HammingWords(Bridge.expression(a), Bridge.expression(b)))

  /** RAW cosine from the native dot (0/0 ⇒ NaN on zero vectors) —
    * production paths use [[graft.operators.Similarity.cosineNative]],
    * which adds the zero-norm guard.
    */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }
}
