package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the hand-written docs to the query registry (VERDICT r9
  * item 1 — the README/OPERATORS counts drifted two rounds running;
  * a failing test ends the drift). Pure file+registry checks, no
  * SparkSession.
  */
class DocsConsistencySpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)

  private lazy val registered: Set[String] = SparkEntry.queries.keySet
  private lazy val regIds: Set[Int] =
    registered.map(_.drop(1).takeWhile(_.isDigit).toInt)

  /** Reference-parity queries (SURVEY.md §2's S/K/P/J/A/F surface,
    * mapped row-by-row in the round verdicts) — the one set OPERATORS
    * .md deliberately does not duplicate. Everything else registered
    * must have an OPERATORS.md row.
    */
  private val referenceParity: Set[Int] = Set(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 33, 34, 35, 37, 38, 40, 42, 43, 44, 45, 46, 47,
    48, 49, 50, 51, 53, 54, 55, 56, 58, 59, 61, 65, 66, 68, 69, 70, 72,
    73, 76, 91, 94, 95, 96, 97, 98, 99)

  test("README query counts and range match the registry") {
    val readme = read("README.md")
    val counts = """(\d+) (?:named queries|registered names)""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, "README no longer states a query count")
    counts.foreach { c =>
      assert(c === registered.size,
        s"README claims $c queries; registry has ${registered.size}")
    }
    val ranges = """q01[–-]q(\d+)""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toList
    assert(ranges.nonEmpty, "README no longer states the q-range")
    ranges.foreach { hi =>
      assert(hi === regIds.max,
        s"README claims range ends at q$hi; registry ends at q${regIds.max}")
    }
  }

  test("every OPERATORS.md gate reference resolves to a registered query") {
    val ops = """q(\d{2,3})""".r.findAllMatchIn(read("OPERATORS.md"))
      .map(_.group(1).toInt).toSet
    val stale = ops.diff(regIds)
    assert(stale.isEmpty, s"OPERATORS.md references unregistered: " +
      stale.toSeq.sorted.map("q" + _).mkString(", "))
  }

  test("every extension query has an OPERATORS.md row") {
    val ops = """q(\d{2,3})""".r.findAllMatchIn(read("OPERATORS.md"))
      .map(_.group(1).toInt).toSet
    val missing = regIds.diff(ops).diff(referenceParity)
    assert(missing.isEmpty, s"extension queries missing an " +
      s"OPERATORS.md row: " +
      missing.toSeq.sorted.map("q" + _).mkString(", "))
  }
}
