package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacyDqSpec extends SparkSpec {

  import spark.implicits._

  private def people = Seq(
    // QI (city, band): "a"/1 has 3 rows but one sensitive value;
    // "a"/2 has 1 row; "b"/1 has 2 rows with 2 sensitive values.
    ("a", 1, "flu"), ("a", 1, "flu"), ("a", 1, "flu"),
    ("a", 2, "cold"),
    ("b", 1, "flu"), ("b", 1, "cold"))
    .toDF("city", "band", "dx")

  test("kAnonymityAudit: group sizes, diversity, verdicts") {
    val out = Privacy.kAnonymityAudit(
        people, Seq("city", "band"), col("dx"), k = 2, l = 2)
      .orderBy("city", "band")
      .as[(String, Int, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    assert(out === Seq(
      ("a", 1, 3L, 1L, true, false),  // k-anon but not diverse
      ("a", 2, 1L, 1L, false, false), // singleton fails both
      ("b", 1, 2L, 2L, true, true)))
  }

  test("suppressSmallGroups: risky QI cells nulled, rest untouched, schema kept") {
    val out = Privacy.suppressSmallGroups(
      people, Seq("city", "band"), col("dx"), k = 2)
    assert(out.columns.toSeq === Seq("city", "band", "dx"))
    val rows = out.as[(Option[String], Option[Int], String)]
      .collect().toSeq.sortBy(r => (r._1.getOrElse("~"), r._3))
    // the ("a", 2) singleton is suppressed; its sensitive value stays
    assert(rows.count(r => r._1.isEmpty && r._2.isEmpty) === 1)
    assert(rows.exists(r => r._1.isEmpty && r._3 == "cold"))
    // all other rows keep their QI values
    assert(rows.count(_._1.contains("a")) === 3)
    assert(rows.count(_._1.contains("b")) === 2)
  }

  test("suppressSmallGroups: null QI values group together (null-safe equality)") {
    val df = Seq(
      (Option.empty[String], "x"), (Option.empty[String], "y"),
      (Some("c"), "z"))
      .toDF("city", "dx")
    val out = Privacy.suppressSmallGroups(df, Seq("city"), col("dx"), k = 2)
    // the two null-city rows form a group of 2 → k-anonymous → kept;
    // the "c" singleton is suppressed (city→null). All 3 rows survive.
    assert(out.count() === 3)
    assert(out.filter(col("city").isNotNull).count() === 0 ||
      out.filter(col("city") === "c").count() === 0)
  }

  test("checkAll: one pass, ppm exactness, pass polarity, empty-safe") {
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), -5.0), (None, 3.0), (Some(2L), 7.0))
      .toDF("id", "v")
    val out = DataQuality.checkAll(df, Seq(
        DataQuality.Check("id_complete",
          DataQuality.completeness(col("id")), 1000000L),
        DataQuality.Check("id_unique",
          DataQuality.uniqueRatio(col("id")), 1000000L),
        DataQuality.Check("v_nonneg",
          DataQuality.satisfiesRatio(col("v") >= 0), 1000000L)))
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (0L, "id_complete", 750000L, false),
      (1L, "id_unique", 500000L, false),
      (2L, "v_nonneg", 750000L, false)))

    // empty input: ratios are 0 ppm (guarded division), never error
    val empty = DataQuality.checkAll(
        df.filter(lit(false)),
        Seq(DataQuality.Check("c", DataQuality.completeness(col("id")), 1L)))
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(empty === Seq((0L, "c", 0L, false)))
  }

  test("auditFromSensitiveGrid ≡ kAnonymityAudit over the same rows") {
    val direct = Privacy.kAnonymityAudit(
      people, Seq("city", "band"), col("dx"), k = 2, l = 2)
    val grid = people.groupBy(col("city"), col("band"), col("dx"))
      .count()
    val fromGrid = Privacy.auditFromSensitiveGrid(
      grid, Seq("city", "band"), "count", k = 2, l = 2)
    assert(direct.orderBy("city", "band").collect().toSeq ===
      fromGrid.orderBy("city", "band").collect().toSeq)
  }

  test("checkAll: null predicate counts as violation") {
    val df = Seq(Some(5.0), None, Some(-1.0)).toDF("v")
    val out = DataQuality.checkAll(df, Seq(
        DataQuality.Check("v_nonneg",
          DataQuality.satisfiesRatio(col("v") >= 0), 1L)))
      .as[(Long, String, Long, Boolean)].collect().head
    assert(out._3 === 333333L) // only the 5.0 row satisfies
  }

  test("tClosenessAudit: identical distribution 0, concentrated group flagged") {
    import spark.implicits._
    // group A mirrors the global 50/50 split exactly; group B is all
    // bin 1 — maximal skew. Global: bins {1: 3, 2: 1} over 4 rows.
    val df = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 1L))
      .toDF("g", "s")
    val got = Privacy.tClosenessAudit(df, Seq("g"), col("s"),
        tPpm = 300000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // A: p=(500000,500000) vs global (750000,250000):
    //   cum diffs -250000, 0 → EMD = 250000/(2-1)
    assert(got("A") === ((2L, 250000L, true)))
    // B: p=(1000000,0) vs global: cum diffs 250000, 0 → 250000
    assert(got("B") === ((2L, 250000L, true)))
    // one-bin domain: EMD is 0 by definition
    val one = Privacy.tClosenessAudit(
        Seq(("A", 7L), ("B", 7L)).toDF("g", "s"), Seq("g"), col("s"),
        tPpm = 0L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(one === Map("A" -> 0L, "B" -> 0L))
  }

  test("generalizeToK: minimal passing level, one rule for the table") {
    // bands 10..13 in segment X, one row each: level 0 (div 1) has
    // four singletons → fails k=4; level 1 (div 10) folds all four
    // into band 1 → group of 4 → passes. The release must pick
    // level 1, never level 2.
    val df = Seq(("X", 10L), ("X", 11L), ("X", 12L), ("X", 13L))
      .toDF("seg", "band")
    val got = Privacy.generalizeToK(df, Seq("seg"), "band",
        Seq(1L, 10L, 100L), k = 4)
      .select("band", "gen_band", "gen_level")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.forall { case (_, gb, lev) => gb == 1L && lev == 1 })
  }

  test("generalizeToK: no level suffices → suppression level") {
    // two segments with 1 and 3 rows: even full generalization
    // leaves the singleton segment's group at n=1 < k — the band
    // suppresses to null at level divisors.size
    val df = Seq(("X", 10L), ("Y", 10L), ("Y", 11L), ("Y", 12L))
      .toDF("seg", "band")
    val got = Privacy.generalizeToK(df, Seq("seg"), "band",
        Seq(1L, 10L), k = 2)
      .select("gen_band", "gen_level")
      .collect().map(r => (r.isNullAt(0), r.getInt(1)))
    assert(got.forall { case (isNull, lev) => isNull && lev == 2 })
  }
}
