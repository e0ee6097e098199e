package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Digest helper shared by interpreted and generated code. */
object HashUtil {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of the MD5 digest as a non-negative long — exactly
    * `conv(substr(md5(s),1,15),16,10)`: 15 hex chars = bytes 0..6 plus
    * the high nibble of byte 7, i.e. the big-endian first-8-bytes long
    * shifted right by one nibble.
    */
  def md5h60(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Native form of [[graft.operators.TextAnalysis.hash60]]: the portable
  * expression builds a 32-char hex STRING per row and re-parses 15
  * chars of it with `conv` — two allocations and a radix parse in the
  * hottest loop of MinHash/SimHash. This computes the same 60-bit
  * value straight from the digest bytes. Bit-equality with the
  * portable path (and therefore with the DuckDB oracles) is asserted
  * in Md5Hash60Spec.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5h60 requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5h60"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.md5h60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.md5h60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def hash60Native(c: Column): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c)))
}
