package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass whole-word counter for N stopword profiles.
  *
  * The portable form is one `regexp_count(lower(text),
  * '\b(w1|w2|…)\b')` PER PROFILE — the language-ID path scans the
  * text four times (plus CJK). This expression tokenizes once
  * (maximal runs of the Java-regex `\w` class, `[A-Za-z0-9_]`) and
  * counts membership in every profile in that single pass.
  *
  * Equivalence to the regex (property-tested in
  * StopwordSetCountsSpec): a `\b(word)\b` match requires word
  * boundaries on both sides, which inside a maximal `\w` run exist
  * only at its ends — so matches are exactly the runs equal to a
  * word, one per run; lowercasing the run reproduces the
  * `lower(text)` input convention. Unicode letters are not `\w` in
  * Java regex, so they delimit runs here too.
  *
  * Codegen: whole-stage friendly via a reference-object call (the
  * matcher state — the word→profiles map — lives on the expression
  * instance; the generated code is one virtual call per row, not a
  * fallback that closes the codegen span).
  */
case class StopwordSetCounts(child: Expression, wordSets: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_stopword_counts"

  /** word (lowercase) → indices of the profiles containing it. */
  @transient private lazy val wordToSets: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    wordSets.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val k = w.toLowerCase(java.util.Locale.ROOT)
        m.put(k, Option(m.get(k)).map(_ :+ i).getOrElse(Array(i)))
      }
    }
    m
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Public for the generated code's reference-object call. */
  def countRuns(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val counts = new Array[Int](wordSets.size)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(s.charAt(i))) i += 1
      if (i > start) {
        val sets = wordToSets.get(
          s.substring(start, i).toLowerCase(java.util.Locale.ROOT))
        if (sets != null) {
          var j = 0
          while (j < sets.length) { counts(sets(j)) += 1; j += 1 }
        }
      }
    }
    new GenericArrayData(counts.map(Int.box))
  }

  override protected def nullSafeEval(input: Any): Any =
    countRuns(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("swCounter", this, classOf[StopwordSetCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countRuns($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StopwordSetCounts = copy(child = newChild)
}

object StopwordSetCounts {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: array of per-profile whole-word counts. */
  def counts(text: Column, wordSets: Seq[Seq[String]]): Column =
    Bridge.column(StopwordSetCounts(Bridge.expression(text), wordSets))
}
