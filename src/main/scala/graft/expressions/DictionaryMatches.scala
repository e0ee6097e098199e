package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-level Aho–Corasick dictionary matcher (Aho & Corasick 1975):
  * every (position, phrase) match of a multi-word phrase dictionary
  * against the whitespace tokens of the lowercased input, in ONE pass
  * over the text.
  *
  * This is the scan-speed form of
  * [[graft.operators.QualityFilters.blocklistMatch]]: the join
  * formulation explodes one n-gram stream per distinct phrase LENGTH
  * and shuffles each against the dictionary — fine at a handful of
  * lengths, but a 100k-phrase blocklist with lengths 1..8 costs eight
  * exploded corpus passes. Here the automaton (goto/fail/output — the
  * textbook construction, with dictionary-suffix outputs merged in
  * BFS order) lives on the expression instance and the row cost is
  * O(tokens + matches), independent of dictionary size. Matches are
  * emitted token-position-ascending, phrases at one position sorted —
  * a total order, so downstream aggregates hash-gate.
  *
  * Match semantics are EXACTLY blocklistMatch's: a phrase of n tokens
  * matches at every position whose n-token window equals it
  * (overlapping and nested matches all count; tokenization is
  * trim+split-on-\s+ of the lowercased text, empty text ⇒ no tokens).
  * Equivalence is gated end-to-end (q488 replays q398's oracle) and
  * property-tested against blocklistMatch.
  *
  * Codegen: whole-stage friendly via a reference-object call (the
  * StopwordSetCounts discipline) — one virtual call per row, no
  * fallback closing the codegen span.
  */
case class DictionaryMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dictionary_matches"

  // --- automaton (built lazily on each executor from the phrase list)

  @transient private lazy val (gotoMaps, failLink, outputs) = {
    val normalized = phrases.iterator
      .map(_.toLowerCase(java.util.Locale.ROOT).trim)
      .filter(_.nonEmpty)
      .map(_.split("\\s+").toSeq)
      .toSeq.distinct
    val gotos = ArrayBuffer(new java.util.HashMap[String, Int]())
    val out = ArrayBuffer(List.empty[String])
    normalized.foreach { toks =>
      var st = 0
      toks.foreach { tk =>
        val g = gotos(st)
        st = if (g.containsKey(tk)) g.get(tk) else {
          gotos += new java.util.HashMap[String, Int]()
          out += Nil
          g.put(tk, gotos.size - 1)
          gotos.size - 1
        }
      }
      out(st) = (toks.mkString(" ") :: out(st)).sorted
    }
    val fail = new Array[Int](gotos.size)
    val queue = new java.util.ArrayDeque[Int]()
    gotos(0).forEach((_, child) => { fail(child) = 0; queue.add(child); () })
    while (!queue.isEmpty) {
      val v = queue.poll()
      gotos(v).forEach { (tk, child) =>
        var f = fail(v)
        while (f != 0 && !gotos(f).containsKey(tk)) f = fail(f)
        fail(child) =
          if (gotos(f).containsKey(tk) && gotos(f).get(tk) != child)
            gotos(f).get(tk)
          else 0
        // dictionary-suffix outputs fold in at build time, so the
        // match loop never chases suffix links
        out(child) = (out(child) ++ out(fail(child))).sorted
        queue.add(child)
        ()
      }
    }
    (gotos.toArray, fail, out.toArray)
  }

  /** Public for the generated code's reference-object call. */
  def matchTokens(input: UTF8String): GenericArrayData = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT).trim
    val res = ArrayBuffer.empty[Any]
    if (s.nonEmpty) {
      val toks = s.split("\\s+")
      var st = 0
      var i = 0
      while (i < toks.length) {
        val tk = toks(i)
        while (st != 0 && !gotoMaps(st).containsKey(tk)) st = failLink(st)
        st = if (gotoMaps(st).containsKey(tk)) gotoMaps(st).get(tk) else 0
        outputs(st).foreach(p => res += UTF8String.fromString(p))
        i += 1
      }
    }
    new GenericArrayData(res.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    matchTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatcher", this,
      classOf[DictionaryMatches].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matchTokens($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DictionaryMatches = copy(child = newChild)
}

object DictionaryMatches {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: every (position, phrase) match as an array of phrase
    * strings, position-ascending / phrase-sorted within a position.
    */
  def matches(text: Column, phrases: Seq[String]): Column =
    Bridge.column(DictionaryMatches(Bridge.expression(text), phrases))
}
