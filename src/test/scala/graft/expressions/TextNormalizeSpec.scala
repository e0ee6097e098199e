package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** The one-pass name/postal scans must agree EXACTLY with the
  * regex-composed forms they replace — fixed-seed fuzz over strings
  * shaped like edge names (latin, digits, punctuation, latin-1
  * accents, astral codepoints, long runs), plus the null/empty edges.
  */
class TextNormalizeSpec extends SparkSpec {

  private val pieces = Seq(
    "Acme", "acme-01", "HQ 2", "branch_7", "-lead", " pad ", "Invalid",
    "é", "ü", "€", "中文", "🙂", "#", "(", "|", "'", ".", "..",
    "ÿ", "Ā", "x" * 35, "9" * 25, "\t", "\n")

  private def fuzz(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(20260813L)
    (0 until n).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => pieces(rnd.nextInt(pieces.size)))
        .mkString
    } ++ Seq("", " ", "€€", "€a", "a€b", "#x", "x#", "-", ".", null,
      "a" * 61, "a" * 59 + "€zz", "Ab€cd")
  }

  test("sanitizeValidName equals validName∘sanitize on fuzzed strings") {
    import spark.implicits._
    val rows = fuzz(400).toDF("s").select(col("s"),
      TextNormalize.sanitizeValidName(col("s")).as("fast"),
      Text.validName(Text.sanitize(col("s"))).as("slow"))
      .collect()
    rows.foreach { r =>
      val in = if (r.isNullAt(0)) "null" else s"'${r.getString(0)}'"
      assert(r.isNullAt(1) === r.isNullAt(2), s"null parity on $in")
      if (!r.isNullAt(1))
        assert(r.getString(1) === r.getString(2), s"input $in")
    }
  }

  test("validPostal native equals the rlike form on fuzzed strings") {
    import spark.implicits._
    val rows = fuzz(400).toDF("s").select(col("s"),
      TextNormalize.validPostal(col("s"), lit("FB")).as("fast"),
      Text.validPostal(col("s"), lit("FB")).as("slow"))
      .collect()
    rows.foreach { r =>
      val in = if (r.isNullAt(0)) "null" else s"'${r.getString(0)}'"
      assert(r.getString(1) === r.getString(2), s"input $in")
    }
  }

  test("pinned goldens: rlike '$' tolerates one final line terminator") {
    import spark.implicits._
    val cases = Seq("90210", "90210\n", "90210\r\n", "90210\r",
      "90210\n\n", "90210\nX", "\n", "90#10\n", null)
    val rows = cases.toDF("s").select(col("s"),
      TextNormalize.validPostal(col("s"), lit("FB")).as("fast"),
      Text.validPostal(col("s"), lit("FB")).as("slow")).collect()
    rows.foreach { r =>
      val in = if (r.isNullAt(0)) "null" else s"'${r.getString(0)}'"
      assert(r.getString(1) === r.getString(2), s"input $in")
    }
    val fast = rows.map(r => (if (r.isNullAt(0)) null else r.getString(0))
      -> r.getString(1)).toMap
    assert(fast("90210\n") === "90210\n")   // $ before the final \n
    assert(fast("90210\r\n") === "90210\r\n")
    assert(fast("90210\n\n") === "FB")      // only ONE final terminator
    assert(fast("90210\nX") === "FB")
    assert(fast(null) === "FB")             // null falls back
  }

  test("pinned goldens: strip/run/cap semantics") {
    import spark.implicits._
    val got = Seq("Ab€cd", "€#abc", "(Acme)", "Acme#1", "a" * 61, "é",
        "x€" * 40)
      .toDF("s")
      .select(TextNormalize.sanitizeValidName(col("s"))).as[String]
      .collect()
    assert(got(0) === "Abcd")      // dropped astral char joins the run
    assert(got(1) === "Invalid")   // first latin1 char disallowed
    assert(got(2) === "Invalid")   // leading paren
    assert(got(3) === "Acme")      // run ends at '#'
    assert(got(4) === "a" * 60)    // {1,60} cap
    assert(got(5) === "Invalid")   // é kept by sanitize, not a name char
    assert(got(6) === "x" * 40)    // cap counts kept chars only
  }

  test("nfcNative: composition goldens + codegen ≡ interpreted") {
    import spark.implicits._
    import java.text.Normalizer
    val cases = Seq("é", "é", "über", "Å",
      "already plain", "", "中文", "🙂x", "가",
      "ö́", "q̣̇", null) // reorderable marks
    val got = cases.toDF("s")
      .select(col("s"), TextNormalize.nfcNative(col("s")).as("n"))
      .collect()
      .map(r => Option(r.getString(0)) -> Option(r.getString(1))).toMap
    cases.foreach {
      case null => assert(got(None).isEmpty)
      case s => assert(got(Some(s)) ===
        Some(Normalizer.normalize(s, Normalizer.Form.NFC)), s"'$s'")
    }
    assert(got(Some("é")) === Some("é"))
    assert(got(Some("가")) === Some("가")) // jamo → 가
    // interpreted path: direct eval on catalyst literals
    cases.filter(_ != null).foreach { s =>
      val e = NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          s, org.apache.spark.sql.types.StringType))
      assert(e.eval(null).toString ===
        Normalizer.normalize(s, Normalizer.Form.NFC), s"interp '$s'")
    }
  }
}
