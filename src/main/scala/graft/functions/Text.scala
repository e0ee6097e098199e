package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (SURVEY §2.7 F1-F5).
  *
  * Most are pure `Column` expressions (codegen'd by Catalyst) — no UDFs:
  * a Scala UDF breaks whole-stage codegen and blocks predicate pushdown
  * through the projection, which matters when these run inside a
  * 100 TB scan. The one exception is [[marketingName]], where the
  * reference's output is defined by an ordered chain of 20 literal
  * `str.replace` calls whose exact semantics (left-to-right,
  * non-overlapping, case-sensitive) matter for golden parity — a small
  * deterministic UDF per SURVEY §2.9.
  */
object Text {

  /** F1 `sanitize_text` (`Functions/data_sanitization.py:12-28`): the
    * reference latin1-encodes with errors=ignore (drops codepoints
    * > 0xFF) and maps empty results to 'Invalid'; None passes through
    * as None.
    */
  def sanitize(c: Column): Column = {
    val stripped = regexp_replace(c, "[^\\x00-\\xFF]", "")
    when(c.isNull, lit(null).cast("string"))
      .when(stripped === "", lit("Invalid"))
      .otherwise(stripped)
  }

  /** F2 name validation (`powerbi_main_fun.py:1112-1116`,
    * `fun_mysql_inserts.py:94-98`): the reference uses ANCHORED
    * `re.match('[A-Za-z0-9_ -]{1,60}')` — it keeps the LEADING run of
    * allowed characters (up to 60) and returns 'Invalid' when the very
    * first character is disallowed. "Acme#1" ⇒ "Acme" (not "Acme1"),
    * "(Acme)" ⇒ "Invalid".
    */
  def validName(c: Column): Column = {
    val kept = regexp_extract(c, "^[A-Za-z0-9_ -]{1,60}", 0)
    when(kept.isNull || kept === "", lit("Invalid")).otherwise(kept)
  }

  /** F4 country-code normalization (`powerbi_main_fun.py:796-819`):
    * the reference's exact code→name map (case-sensitive equality on
    * the already-upper ISO codes it receives; we upper() defensively).
    * A broadcast dim is the scale path when the map grows; at 10
    * entries a folded literal chain is cheaper than any join.
    */
  def normalizeCountry(c: Column): Column = {
    val m = Seq(
      "US" -> "United States of America", "USA" -> "United States of America",
      "TH" -> "Thailand", "DE" -> "Germany", "ES" -> "Spain",
      "UK" -> "United Kingdom", "NL" -> "Netherlands", "CA" -> "Canada",
      "FR" -> "France", "IT" -> "Italy", "AU" -> "Australia")
    m.foldLeft(Option.empty[Column]) {
      case (None, (k, v))       => Some(when(upper(c) === k, v))
      case (Some(acc), (k, v))  => Some(acc.when(upper(c) === k, v))
    }.get.otherwise(c)
  }

  /** F5 postal-code guard (`powerbi_main_fun.py:677-686`): values with
    * characters outside `[A-Za-z0-9_ .-]` fall back to `fallback`.
    */
  def validPostal(c: Column, fallback: Column): Column =
    when(c.rlike("^[A-Za-z0-9_ .-]*$"), c).otherwise(fallback)

  // ------------------------------------------------------------------ F3

  /** The reference's literal replace chain, in call order
    * (`powerbi_main_fun.py:2444-2450`). Each entry is replaced
    * everywhere it occurs (Python `str.replace` = Java `String.replace`:
    * literal, left-to-right, non-overlapping), so ORDER MATTERS — e.g.
    * `'POC '` is consumed before `' POC'` can see it.
    */
  private val MarketingReplacements: Seq[(String, String)] = Seq(
    " Testing" -> "", " test" -> "", "-Test" -> "", " Test" -> "",
    "POC " -> "", "POC_" -> "", "PoC " -> "", "PoC_" -> "",
    " Poc" -> "", " poc" -> "", "poc_" -> "", "poc " -> "",
    "_PoC" -> "", "_POC" -> "", "_poc" -> "", " PoC" -> "",
    "XC " -> "", "XO " -> "", " POC" -> "",
    "  " -> " ")

  /** The reference's extraction regex (`powerbi_main_fun.py:2454`):
    * `[^0-9_'"|& -][A-Za-z^0-9_'"|& -][A-Za-z'"& - ]*`. Subtle: in the
    * THIRD class the dash sits between two spaces, which Python parses
    * as the empty range space-to-space — so the tail does NOT admit
    * '-' ("Acme-Corp" extracts "Acme"). The first two classes end in
    * `" -]"`, where the dash IS literal.
    */
  private val MarketingExtract =
    """[^0-9_'"|& \-][A-Za-z^0-9_'"|& \-][A-Za-z'"& ]*""".r

  /** F3 marketing-name cleanup (`powerbi_main_fun.py:2437-2467`),
    * reproduced exactly:
    *  1. the 20-replace chain above (incl. the single-pass `'  '→' '`,
    *     which does NOT fully collapse 3+ spaces — Python parity);
    *  2. `.strip(' ').strip('-').strip(' ')`;
    *  3. `.split(' from VCO')[0]`;
    *  4. empty ⇒ 'Invalid'; else first regex match;
    *  5. non-empty but no regex match: the reference raises and skips
    *     the write (unbound variable caught at `2465`); we return null —
    *     the explicit form of "no value produced" (SURVEY §7.4.7).
    */
  def marketingNameScala(name: String): String = {
    if (name == null) return null
    val replaced = MarketingReplacements.foldLeft(name) {
      case (s, (from, to)) => s.replace(from, to)
    }
    // Python strip(' ').strip('-').strip(' ') — three bounded trims,
    // not a combined character set.
    def stripChar(s: String, ch: Char): String = {
      var i = 0; var j = s.length
      while (i < j && s.charAt(i) == ch) i += 1
      while (j > i && s.charAt(j - 1) == ch) j -= 1
      s.substring(i, j)
    }
    val stripped = stripChar(stripChar(stripChar(replaced, ' '), '-'), ' ')
    val trimmed = {
      val idx = stripped.indexOf(" from VCO")
      if (idx >= 0) stripped.substring(0, idx) else stripped
    }
    if (trimmed.isEmpty) "Invalid"
    else MarketingExtract.findFirstIn(trimmed).orNull
  }

  private val marketingNameUdf = udf(marketingNameScala _)

  def marketingName(c: Column): Column = marketingNameUdf(c)
}
