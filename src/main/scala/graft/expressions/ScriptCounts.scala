package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codepoint-range counter for N script classes.
  *
  * The portable form is one `regexp_count(text, '[\x{lo}-\x{hi}…]')`
  * PER CLASS — profiling six scripts scans the text six times. This
  * expression walks the string once and increments every class whose
  * interval set contains the current BMP code unit.
  *
  * Equivalence to the regex form: all intervals are BMP and exclude
  * the surrogate block, so UTF-16 code units equal code points for
  * every countable char; supplementary characters (surrogate pairs)
  * match no interval on either side. Interval sets may overlap — a
  * char then counts toward every containing class, exactly as
  * independent regex passes would.
  *
  * Codegen: whole-stage friendly via a reference-object call (the
  * interval table lives on the expression instance; generated code is
  * one virtual call per row, not a CodegenFallback).
  */
case class ScriptCounts(child: Expression, classes: Seq[Seq[(Int, Int)]])
    extends UnaryExpression {
  require(classes.nonEmpty &&
    classes.forall(_.forall { case (lo, hi) =>
      lo <= hi && lo >= 0 && hi <= 0xFFFF &&
        (hi < 0xD800 || lo > 0xDFFF) // never count surrogate units
    }), s"class intervals must be non-surrogate BMP ranges: $classes")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_script_counts"

  // flat interval table: (lo, hi, classIdx) — tiny, linear probe per char
  @transient private lazy val table: Array[(Int, Int, Int)] =
    classes.zipWithIndex.flatMap { case (ivs, i) =>
      ivs.map { case (lo, hi) => (lo, hi, i) }
    }.toArray

  /** Public for the generated code's reference-object call. */
  def countChars(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val counts = new Array[Int](classes.size)
    val t = table
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i).toInt
      var j = 0
      while (j < t.length) {
        if (c >= t(j)._1 && c <= t(j)._2) counts(t(j)._3) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(Int.box))
  }

  override protected def nullSafeEval(input: Any): Any =
    countChars(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scriptCounter", this, classOf[ScriptCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countChars($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ScriptCounts = copy(child = newChild)
}

object ScriptCounts {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: array of per-class codepoint counts. */
  def counts(text: Column, classes: Seq[Seq[(Int, Int)]]): Column =
    Bridge.column(ScriptCounts(Bridge.expression(text), classes))
}
