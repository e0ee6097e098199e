package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate helper shared by interpreted and generated code. One
  * Deflater per thread, reset per row — allocation-free in the loop.
  */
object DeflateUtil {
  private val deflater = new ThreadLocal[Deflater] {
    // fixed level + strategy: the ratio is a deterministic function of
    // the input for a given zlib build (the JDK bundles its own)
    override def initialValue(): Deflater =
      new Deflater(Deflater.BEST_SPEED, true)
  }

  // fixed scratch buffer per thread — the loop only COUNTS compressed
  // bytes, so a small reused buffer gives identical results without a
  // per-row input-sized allocation
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** compressed_size / raw_size of the UTF-8 bytes (0 for empty
    * input). Natural text lands ~0.4–0.7; highly repetitive text
    * (boilerplate, generator loops) compresses far below it; random
    * noise exceeds 1 — the Gopher-style gibberish/repetition signal.
    */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 0.0
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) {
      val n = d.deflate(buf)
      if (n == 0 && !d.finished())
        // finish() was called and input is fully set: a zero-progress
        // deflate here is an invariant violation, never a valid state
        throw new IllegalStateException(
          s"deflate stalled after $total bytes (raw ${raw.length})")
      total += n
    }
    total.toDouble / raw.length
  }
}

/** Compression-ratio quality signal as a native expression — there is
  * no built-in or SQL-portable zlib, so this is the (c) tier of the
  * custom-operator ladder: a codegen'd UnaryExpression calling a
  * static helper (the ShingleUtil pattern). Gated rows-only (q120) —
  * the one query without a DuckDB oracle — with the behavioral
  * contract pinned in DeflateRatioSpec instead.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"deflate_ratio requires string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateUtil.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DeflateUtil.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def deflateRatio(c: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(c)))
}
