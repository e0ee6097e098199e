package graft.queries

import graft.SparkSpec
import graft.functions.Text

/** The q51 oracle pins golden marketing-name outputs per fixture
  * class as SQL literals; this spec asserts those literals against
  * the actual [[Text.marketingNameScala]] so the oracle can never
  * drift from the function it claims to gate
  * (`powerbi_main_fun.py:2437-2467` semantics).
  */
class GoldQueriesSpec extends SparkSpec {

  test("q51 fixture classes map to the pinned golden outputs") {
    val golden = Seq(
      "POC Acme Corp" -> "Acme Corp", // 'POC ' consumed by the chain
      "Acme test" -> "Acme", // ' test' removed, then strip
      "Acme-Test" -> "Acme", // '-Test' removed
      "Acme  Corp" -> "Acme Corp", // single-pass '  '→' '
      "--Acme--" -> "Acme", // bounded strip('-')
      "Acme from VCO7" -> "Acme", // ' from VCO' split
      "123" -> null, // regex no-match ⇒ no value produced
      "Acme-Corp" -> "Acme") // third-class dash quirk stops the match
    golden.foreach { case (in, out) =>
      assert(Text.marketingNameScala(in) === out, s"input '$in'")
    }
    assert(Text.marketingNameScala(null) === null)
  }

  test("q47 edge fixture name classes match the pinned goldens") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Seq("Edge 35", "(bad36", "Ed€ge37", null, "")
      .toDF("name")
    val out = in.select(
      Text.validName(Text.sanitize(col("name"))).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("Edge 35", "Invalid", "Edge37", "Invalid", "Invalid"))
  }
}
