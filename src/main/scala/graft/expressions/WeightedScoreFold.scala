package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the A9 running-weighted-score
  * recurrence (`powerbi_main_fun.py:2048-2049`):
  * `s ← ((s·n) + x) · 12.5 / (n+1)` folded left-to-right.
  *
  * The portable formulation ([[graft.operators.License.runningWeightedScore]],
  * a higher-order `aggregate` with a struct accumulator) evaluates two
  * lambda dispatches and a struct allocation per element in the
  * interpreter — the DotProductF situation again (VERDICT r3 item 10).
  * This compiles to a primitive double loop.
  *
  * Bit-identity with the HOF form (asserted by property in
  * WeightedScoreFoldSpec): same IEEE op order
  * `((s * (double)n) + x) * 12.5 / (double)(n+1)`, same +0.0 seed, and
  * the same null semantics — a null ELEMENT nulls the result (the
  * struct accumulator's `s` goes null and stays null), a null array is
  * null, an empty array is 0.0 (the seed).
  */
case class WeightedScoreFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_weighted_score requires array<double>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_weighted_score"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s = ((s * i) + arr.getDouble(i)) * 12.5d / (i + 1)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s = (($s * (double) $i) + $a.getDouble($i)) * 12.5 / (double) ($i + 1);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WeightedScoreFold = copy(child = newChild)
}

object WeightedScoreFold {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API over the native expression. */
  def scoreF(scores: Column): Column =
    Bridge.column(WeightedScoreFold(Bridge.expression(scores)))
}
