package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle→hash kernel shared by interpreted and generated
  * code: [[ShingleUtil.shingles]] composed with
  * [[HashUtil.md5h60]] mod `p` in one pass, never materializing the
  * string array through an interpreted lambda.
  */
object ShingleHashUtil {
  def shingleHashes(s: UTF8String, n: Int, p: Long): ArrayData = {
    val sh = ShingleUtil.shingles(s, n)
    val m = sh.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = HashUtil.md5h60(sh.getUTF8String(i)) % p
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native form of `transform(shinglesNative(text, n), s ->
  * md5h60(s) % p)`: the portable composition routes every element
  * through Catalyst's interpreted ArrayTransform/LambdaFunction —
  * the one non-codegen expression left on the MinHash signature
  * path. This computes the hash array in a single fused pass.
  * Bit-equality with the portable composition is asserted in
  * ShingleHashesSpec (including codegen ≡ interpreted).
  */
case class ShingleHashes(child: Expression, n: Int, p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 && p >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure("need n >= 1, p >= 1")
    case t => TypeCheckResult.TypeCheckFailure(s"shingleHashes requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.shingleHashes(input.asInstanceOf[UTF8String], n, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleHashUtil.shingleHashes($c, $n, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def shingleHashesNative(c: Column, n: Int, p: Long): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n, p))
}
