package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native forms of the F1∘F2 name cleanup and the F5 postal
  * guard (`graft.functions.Text`).
  *
  * The portable composition `validName(sanitize(c))` costs four regex
  * evaluations per row (the `when` chains duplicate both the
  * `regexp_replace` strip and the `regexp_extract` prefix), and the
  * postal guard adds an `rlike` — q47's projection runs them over
  * every edge name/postal at scan time, which made it the slowest
  * non-I/O query in the suite. Both semantics are plain
  * character-class scans, so each collapses to ONE pass over the
  * string with no regex machinery at all.
  *
  * Bit-parity with the portable forms is property-tested
  * (TextNormalizeSpec) — the subtleties that must carry over:
  *  - sanitize drops codepoints > 0xFF *before* the prefix run is
  *    taken, so a disallowed-but-latin1 char ends the run while a
  *    dropped char lets it continue ("Ab€cd" → "Abcd");
  *  - surrogate halves are both > 0xFF, so astral codepoints drop
  *    exactly like the regex's codepoint-wise `[^\x00-\xFF]`;
  *  - the `{1,60}` cap counts kept chars only;
  *  - empty-after-strip and leading-disallowed both yield 'Invalid'
  *    (the former via sanitize's contract, the latter via
  *    validName's).
  *
  * Codegen: whole-stage friendly via a reference-object call, same
  * playbook as [[StopwordSetCounts]].
  */
case class SanitizeValidName(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_sanitize_valid_name"

  private def allowed(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '_' || c == ' ' || c == '-'

  /** Public for the generated code's reference-object call. */
  def clean(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(math.min(n, 60))
    var i = 0
    var ended = false
    while (i < n && !ended && sb.length < 60) {
      val c = s.charAt(i)
      if (c > 0xFF) () // sanitize drops it — the prefix run continues
      else if (allowed(c)) sb.append(c)
      else ended = true
      i += 1
    }
    if (sb.length == 0) SanitizeValidName.Invalid
    else UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("svn", this, classOf[SanitizeValidName].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.clean($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SanitizeValidName = copy(child = newChild)
}

object SanitizeValidName {
  private val Invalid = UTF8String.fromString("Invalid")
}

/** True iff every char is in `[A-Za-z0-9_ .-]` — the F5 postal guard's
  * `rlike("^[A-Za-z0-9_ .-]*$")` as a single scan (empty string is
  * valid; null propagates, so the caller's `when(...).otherwise`
  * falls back exactly like the rlike form).
  *
  * Java-regex parity quirk (property-tested): without MULTILINE, `$`
  * also matches just before ONE final line-terminator sequence
  * (\n, \r\n, \r, U+0085, U+2028, U+2029), so "90210\n" passes the
  * rlike — the scan ignores the same final sequence.
  */
case class PostalCharsValid(child: Expression)
    extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_postal_chars_valid"

  private def allowed(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '_' || c == ' ' || c == '.' || c == '-'

  /** Public for the generated code's reference-object call. */
  def ok(input: UTF8String): Boolean = {
    val s = input.toString
    var n = s.length
    // '$' tolerance: one final line-terminator sequence is ignored
    if (n > 0) {
      val last = s.charAt(n - 1)
      if (last == '\n') {
        n -= 1
        if (n > 0 && s.charAt(n - 1) == '\r') n -= 1
      } else if (last == '\r' || last == 133.toChar ||
          last == 8232.toChar || last == 8233.toChar) {
        n -= 1
      }
    }
    var i = 0
    while (i < n) {
      if (!allowed(s.charAt(i))) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(input: Any): Any =
    ok(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcv", this, classOf[PostalCharsValid].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.ok($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PostalCharsValid = copy(child = newChild)
}

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition) as a native codegen'd expression — the encoding-QA
  * step a multilingual crawl needs before any fingerprint/dedup pass:
  * "é" arrives both precomposed (U+00E9) and decomposed (e + U+0301)
  * in the wild, and un-normalized text makes exact dedup silently
  * miss byte-different/canonically-equal duplicates.
  *
  * Spark has no built-in; a Scala UDF would break codegen and pay
  * serialization. Implementation defers to `java.text.Normalizer`
  * (ICU-grade tables shipped in the JDK) behind the same
  * reference-object codegen playbook as [[SanitizeValidName]], with a
  * fast pre-check (`Normalizer.isNormalized`) so the common
  * already-NFC case allocates nothing. Cross-engine parity with
  * DuckDB's `nfc_normalize` is hash-gated (q339).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  /** Public for the generated code's reference-object call. */
  def nfc(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nfc($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object TextNormalize {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{coalesce, lit, when}
  import org.apache.spark.sql.graftbridge.Bridge

  /** One-pass `Text.validName(Text.sanitize(c))`.
    *
    * Null parity: the portable composition maps a NULL name to
    * 'Invalid' (regexp_extract(null) is null, which validName's
    * isNull branch turns into 'Invalid') — the coalesce reproduces
    * that while the expression itself stays null-propagating.
    */
  def sanitizeValidName(c: Column): Column =
    coalesce(Bridge.column(SanitizeValidName(Bridge.expression(c))),
      lit("Invalid"))

  /** One-pass `Text.validPostal(c, fallback)`. */
  def validPostal(c: Column, fallback: Column): Column =
    when(Bridge.column(PostalCharsValid(Bridge.expression(c))), c)
      .otherwise(fallback)

  /** Native Unicode NFC normalization (see [[NfcNormalize]]). */
  def nfcNative(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
