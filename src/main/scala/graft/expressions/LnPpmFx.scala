package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Kernel shared by interpreted and generated code — the EXACT i64
  * algorithm of [[graft.functions.FixedPoint]]'s portable fold (and of
  * its DuckDB recursive-CTE mirror `lnPpmSqlCtes`): normalize
  * m = (num·2^30) div den into [2^30, 2^31) counting downshifts, then
  * 20 shift-and-square rounds (Majithia & Levan 1973) emit the log2
  * fractional bits; ln_ppm = ((e·2^20 + f)·693147) div 2^20. Every
  * step is an i64 shift/multiply/compare, so bit-identity with both
  * mirrors is structural, and LnPpmFxSpec asserts it.
  */
object LnPpmUtil {
  def lnPpm(num: Long, den: Long): Long = {
    var m = (num * (1L << 30)) / den
    var e = 0L
    var i = 0
    while (i < 34) {
      if (m >= (1L << 31)) { m >>= 1; e += 1 }
      i += 1
    }
    var f = 0L
    i = 0
    while (i < 20) {
      val sq = (m * m) >> 30
      if (sq >= (1L << 31)) { m = sq >> 1; f = f * 2 + 1 }
      else { m = sq; f = f * 2 }
      i += 1
    }
    ((e * (1L << 20) + f) * 693147L) / (1L << 20)
  }
}

/** Native codegen form of [[graft.functions.FixedPoint.lnPpm]]. The
  * portable Column composition runs through TWO higher-order
  * `aggregate` folds (34 + 20 runtime lambda steps), and higher-order
  * functions are CodegenFallback in Spark — every lnPpm call used to
  * break the surrounding whole-stage-codegen span and pay ~54
  * interpreted closure dispatches per row. This is the same 54 steps
  * as two tight Java loops inside the generated code. Contract
  * (checked by the caller, documented in FixedPoint): num ≥ den ≥ 1,
  * num < 2^33.
  */
case class LnPpmFx(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_ln_ppm requires (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ln_ppm"

  override protected def nullSafeEval(num: Any, den: Any): Any =
    LnPpmUtil.lnPpm(num.asInstanceOf[Long], den.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (n, d) => s"graft.expressions.LnPpmUtil.lnPpm($n, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LnPpmFx =
    copy(left = newLeft, right = newRight)
}

object LnPpmFx {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def lnPpmNative(num: Column, den: Column): Column =
    Bridge.column(LnPpmFx(Bridge.expression(num), Bridge.expression(den)))
}
