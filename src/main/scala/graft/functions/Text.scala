package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (SURVEY §2.7 F1-F5).
  *
  * All are pure `Column` expressions (codegen'd by Catalyst) — no UDFs:
  * a Scala UDF breaks whole-stage codegen and blocks predicate pushdown
  * through the projection, which matters when these run inside a
  * 100 TB scan.
  */
object Text {

  /** F1 `sanitize_text` (`Functions/data_sanitization.py:12-28`): the
    * reference latin1-encodes with errors=ignore (drops non-latin1
    * chars) and maps empty results to 'Invalid'. Re-expressed as a
    * regexp strip of non-latin1 codepoints.
    */
  def sanitize(c: Column): Column = {
    val stripped = regexp_replace(c, "[^\\x00-\\xFF]", "")
    when(stripped.isNull || stripped === "", lit("Invalid")).otherwise(stripped)
  }

  /** F2 name validation (`powerbi_main_fun.py:1112-1116`,
    * `fun_mysql_inserts.py:94-98`): keep only `[A-Za-z0-9_ -]{1,60}`
    * matches, else 'Invalid'. The reference uses `re.findall` and joins
    * the pieces; equivalently: strip disallowed chars, truncate to 60,
    * empty ⇒ 'Invalid'.
    */
  def validName(c: Column): Column = {
    val kept = substring(regexp_replace(c, "[^A-Za-z0-9_ -]", ""), 1, 60)
    when(kept.isNull || kept === "", lit("Invalid")).otherwise(kept)
  }

  /** F4 country-code normalization (`powerbi_main_fun.py:796-819`):
    * small hardcoded code→name map as a when-chain (a broadcast dim is
    * the scale path when the map grows; at 10 entries a folded literal
    * chain is cheaper than any join).
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

  /** F3 marketing-name cleanup (`powerbi_main_fun.py:2437-2467`): the
    * reference chains ~20 literal `.replace` calls removing POC/test
    * markers, trims, and cuts at ' from VCO'. Same chain as folded
    * regexp_replaces (case-insensitive markers, then the suffix cut).
    */
  def marketingName(c: Column): Column = {
    val markers = Seq("(?i)\\bPOC\\b", "(?i)\\btest\\b", "(?i)\\bdemo\\b",
      "(?i)\\btrial\\b", "(?i)\\blab\\b")
    val cleaned = markers.foldLeft(c)((acc, p) => regexp_replace(acc, p, ""))
    trim(regexp_replace(split(cleaned, " from VCO").getItem(0), " +", " "))
  }
}
