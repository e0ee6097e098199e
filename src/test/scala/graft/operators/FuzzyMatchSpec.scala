package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-name checks for blocked fuzzy matching: blocking prunes
  * cross-block pairs even at distance 0, the distance bound is
  * inclusive, pairs are unordered-unique, and matching is
  * distinct-first (row duplicates don't multiply pairs).
  */
class FuzzyMatchSpec extends SparkSpec {

  import spark.implicits._

  private def matches(names: Seq[String], maxDist: Int) =
    FuzzyMatch.blockedNameMatch(
        names.toDF("name"), "name",
        nm => element_at(split(nm, " "), 2), maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("matches within a block at the inclusive distance bound") {
    val m = matches(Seq("red bolt", "rad bolt", "rainbow bolt"), 1)
    assert(m === Set(("rad bolt", "red bolt", 1)))
    val m2 = matches(Seq("red bolt", "rod bolt", "rid bolt"), 2)
    // all three pairwise at distance 1 ≤ 2, each unordered pair once
    assert(m2 === Set(
      ("red bolt", "rid bolt", 1), ("red bolt", "rod bolt", 1),
      ("rid bolt", "rod bolt", 1)))
  }

  test("blocking prunes near-identical names in different blocks") {
    // distance 1 but different trailing token → never a candidate
    assert(matches(Seq("red bolt", "red bolts"), 5) === Set.empty)
  }

  test("distinct-first: row duplicates neither pair with themselves nor multiply") {
    val m = matches(Seq("red bolt", "red bolt", "rad bolt", "rad bolt"), 1)
    assert(m === Set(("rad bolt", "red bolt", 1)))
  }
}
