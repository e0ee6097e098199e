package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash over every k-char window of a string — the
  * brief's "document fingerprinting (rolling hash)" primitive, and the
  * access path content-defined chunking and plagiarism fingerprinting
  * are built on. One O(n) pass via the rolling update
  * h' = ((h − s[i]·B^(k−1))·B + s[i+k]) mod M, versus the O(n·k)
  * naive recompute — which is exactly what the DuckDB oracle does
  * (list_reduce per window), so the q349 gate proves the rolling
  * algebra ≡ the definitional form on every window of every doc.
  *
  * Arithmetic: B = 131, M = 1e9+7; products stay ≤ (M−1)·B < 2⁴⁷, so
  * the whole computation lives in exact signed-64 range on both
  * engines. Chars are UTF-16 units — identical to codepoints on the
  * ASCII/BMP fixtures; the cross-engine contract is ASCII-exact.
  *
  * Codegen: reference-object call (the [[SanitizeValidName]]
  * playbook); returns an empty array when length(s) < k.
  */
case class RollingHash(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"window k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_hash"

  private val B = 131L
  private val M = 1000000007L

  /** Public for the generated code's reference-object call. */
  def roll(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // B^(k-1) mod M for the outgoing-char removal
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * B % M; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + s.charAt(i)) % M; i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow % M + M) % M
      h = (h * B + s.charAt(i)) % M
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    roll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rh", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.roll($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingHash = copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def rollingNative(c: Column, k: Int): Column =
    Bridge.column(RollingHash(Bridge.expression(c), k))
}
