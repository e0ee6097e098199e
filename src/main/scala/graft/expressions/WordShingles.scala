package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shingle builder shared by interpreted and generated code. Replicates
  * `TextAnalysis.shingles` EXACTLY: lowercase, trim SPACES only
  * (Spark's `trim` touches 0x20 alone), split `\s+` with limit -1
  * (Spark's `split` keeps trailing empties), empty ⇒ empty token list;
  * fewer than n tokens ⇒ one whole-text shingle; else sliding n-grams
  * joined by single spaces.
  */
object ShingleUtil {
  private val WS = Pattern.compile("\\s+")

  def shingles(s: UTF8String, n: Int): ArrayData = {
    val lowered = s.toLowerCase.toString
    // Spark trim: ASCII space only
    var i = 0; var j = lowered.length
    while (i < j && lowered.charAt(i) == ' ') i += 1
    while (j > i && lowered.charAt(j - 1) == ' ') j -= 1
    val trimmed = lowered.substring(i, j)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty else WS.split(trimmed, -1)
    val out: Array[AnyRef] =
      if (toks.length < n) Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val arr = new Array[AnyRef](toks.length - n + 1)
        var k = 0
        val sb = new java.lang.StringBuilder
        while (k <= toks.length - n) {
          sb.setLength(0)
          var m = 0
          while (m < n) {
            if (m > 0) sb.append(' ')
            sb.append(toks(k + m))
            m += 1
          }
          arr(k) = UTF8String.fromString(sb.toString)
          k += 1
        }
        arr
      }
    new GenericArrayData(out)
  }
}

/** Native form of [[graft.operators.TextAnalysis.shingles]]: the
  * portable chain (`transform(sequence(...), i -> concat_ws(slice
  * (...)))`) interprets three lambdas per shingle; this builds the
  * whole array in one pass. Equality with the portable path is
  * asserted over the corpus in WordShinglesSpec.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("n must be >= 1")
    case t => TypeCheckResult.TypeCheckFailure(s"shingles requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def shinglesNative(c: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))
}
