package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Goldens computed by executing the reference's own Python chain
  * (`powerbi_main_fun.py:2437-2467`, `Functions/data_sanitization.py:
  * 12-28`) on each input — not hand-derived.
  */
class TextSpec extends SparkSpec {

  // (input, reference output); None = the reference raises (unbound
  // variable, caught at powerbi_main_fun.py:2465) and writes nothing —
  // our explicit null.
  private val marketingGoldens: Seq[(String, Option[String])] = Seq(
    "Acme-Test"            -> Some("Acme"),
    "Acme Corp POC "       -> Some("Acme Corp"),
    "POC_Acme"             -> Some("Acme"),
    " poc"                 -> Some("Invalid"),
    "Globex from VCO 3"    -> Some("Globex"),
    "A"                    -> None,
    "--Acme--"             -> Some("Acme"),
    "Big   Name Testing"   -> Some("Big  Name"), // single-pass '  '→' '
    "XC Acme XO Widgets"   -> Some("Acme Widgets"),
    "123-456"              -> None,
    "Acme PoC_POC test"    -> Some("Acme"),
    "Acme POC Ltd"         -> Some("Acme Ltd"),
    "  A POC  B "          -> Some("A B"),
    ""                     -> Some("Invalid"),
    "   "                  -> Some("Invalid"),
    "N∀me™ Acme" -> Some("∀me"),
    "Wid_poc_gets"         -> Some("Wid"),
    "O'Brien & Sons | Ltd" -> Some("O'Brien & Sons "),
    "x"                    -> None,
    "zz"                   -> Some("zz"),
    "Acme2000 Inc"         -> Some("Acme"),
    // the tail class does NOT admit '-' (empty range quirk), but the
    // 2nd char class does
    "Acme-Corp"            -> Some("Acme"),
    "AT&T - West"          -> Some("AT&T "),
    "a-b-c"                -> Some("a-b"))

  test("marketingNameScala matches the reference chain on goldens") {
    for ((in, expected) <- marketingGoldens)
      assert(Option(Text.marketingNameScala(in)) === expected, s"input=<$in>")
  }

  test("marketingNameScala: null passes through") {
    assert(Text.marketingNameScala(null) === null)
  }

  test("marketingName column form agrees with the Scala function") {
    val inputs = marketingGoldens.map(_._1)
    import spark.implicits._
    val got = inputs.toDF("name")
      .select(Text.marketingName(col("name")).as("mn"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === marketingGoldens.map(_._2))
  }

  test("fingerprint native canonicalization equals the portable form") {
    import graft.operators.TextAnalysis
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val diffs = d.select(
        TextAnalysis.fingerprint(col("text")).as("n"),
        TextAnalysis.fingerprintPortable(col("text")).as("p"))
      .filter(col("n") =!= col("p")).count()
    assert(diffs === 0)
    // null and whitespace-only text both canonicalize to md5("")
    import spark.implicits._
    val edge = Seq(Option("  "), None).toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("n"),
        TextAnalysis.fingerprintPortable(col("text")).as("p"))
      .collect()
    edge.foreach { r =>
      assert(r.getString(0) === r.getString(1))
      assert(r.getString(0) === "d41d8cd98f00b204e9800998ecf8427e")
    }
  }

  test("sanitize: drops non-latin1, empty→Invalid, null→null") {
    import spark.implicits._
    val rows = Seq("café", "你好", "ok", null, "❤")
      .toDF("s").select(Text.sanitize(col("s")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    // Python: 'café' all latin1; '你好'→''→Invalid; None→None; '❤'→Invalid
    assert(rows.toSeq === Seq(Some("café"), Some("Invalid"), Some("ok"),
      None, Some("Invalid")))
  }

  test("validName: ANCHORED leading run (re.match), 60 cap, Invalid on bad start") {
    import spark.implicits._
    val long = "a" * 70
    val rows = Seq("Valid_Name-1", "bad!@#", "!!!", long, "Acme#1", "(Acme)")
      .toDF("s").select(Text.validName(col("s")).as("c"))
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq("Valid_Name-1", "bad", "Invalid", "a" * 60,
      "Acme", "Invalid"))
  }

  test("validName: randomized agreement with the reference's re.match semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val chars = "abzAZ09_ -#!é|&'(".toCharArray
    val inputs = Seq.fill(200)(
      (0 until rnd.nextInt(80)).map(_ => chars(rnd.nextInt(chars.length))).mkString)
    val got = inputs.toDF("s").select(Text.validName(col("s"))).collect()
      .map(_.getString(0))
    val expected = inputs.map { s =>
      val kept = "^[A-Za-z0-9_ -]{1,60}".r.findFirstIn(s).getOrElse("")
      if (kept.isEmpty) "Invalid" else kept
    }
    assert(got.toSeq === expected)
  }

  test("validPostal: guard with fallback") {
    import spark.implicits._
    val rows = Seq(("94040", "f1"), ("12 34.AB-x_", "f2"), ("bad#code", "f3"))
      .toDF("p", "fb")
      .select(Text.validPostal(col("p"), col("fb")).as("c"))
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq("94040", "12 34.AB-x_", "f3"))
  }

  test("normalizeCountry: mapped codes and passthrough") {
    import spark.implicits._
    val rows = Seq("US", "usa", "UK", "Japan")
      .toDF("c").select(Text.normalizeCountry(col("c")).as("n"))
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq("United States of America",
      "United States of America", "United Kingdom", "Japan"))
  }
}
