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

  test("sortedNeighborhood: window bounds candidates, catches cross-block pairs") {
    import spark.implicits._
    // "red bolt"/"red colt" differ in their SECOND token — q168-style
    // trailing-token blocking separates them; sort adjacency pairs them
    val names = Seq("red bolt", "red colt", "aa", "ab",
      "zz far away").toDF("p")
    val got = FuzzyMatch.sortedNeighborhoodMatch(names, "p",
        nm => nm, window = 2, maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(got === Set(
      ("aa", "ab", 1, 1L),
      ("red bolt", "red colt", 1, 1L)))
    // window=1 on a 3-run: only adjacent pairs, never gap 2
    val run3 = Seq("aa", "ab", "ac").toDF("p")
    val w1 = FuzzyMatch.sortedNeighborhoodMatch(run3, "p", nm => nm,
        window = 1, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(w1 === Set(("aa", "ab"), ("ab", "ac")))
  }
}
