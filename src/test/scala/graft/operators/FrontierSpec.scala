package graft.operators

import graft.SparkSpec

/** RFC 9309 longest-match semantics on hand-built rule/url fixtures —
  * every branch of the rank-parity resolution.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private def gate(urls: Seq[(String, String, String)],
      rules: Seq[(String, String, String)]): Map[String, (Option[Long], Boolean)] =
    Frontier.robotsGate(
        urls.toDF("url", "host", "path"),
        rules.toDF("host", "rtype", "prefix"))
      .collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))))
      .toMap

  test("longest prefix wins; allow beats disallow on a tie") {
    val rules = Seq(
      ("h.com", "disallow", "/d/"),
      ("h.com", "allow", "/d/keep"),
      ("t.com", "disallow", "/p"),
      ("t.com", "allow", "/p"))
    val got = gate(Seq(
      ("u1", "h.com", "/d/x"),        // only /d/ matches → blocked
      ("u2", "h.com", "/d/keeper"),   // longer allow overrides
      ("u3", "h.com", "/other"),      // no rule → default allow
      ("u4", "t.com", "/page"),       // equal length tie → allow
      ("u5", "x.com", "/d/x")         // host with no rules at all
    ), rules)
    assert(got("u1") === ((Some(6L), false)))
    assert(got("u2") === ((Some(15L), true)))
    assert(got("u3") === ((None, true)))
    assert(got("u4") === ((Some(5L), true)))
    assert(got("u5") === ((None, true)))
  }

  test("empty prefix matches every path; rules are host-isolated") {
    val rules = Seq(("a.com", "disallow", ""), ("b.com", "allow", ""))
    val got = gate(Seq(
      ("a1", "a.com", "/any"), ("a2", "a.com", ""),
      ("b1", "b.com", "/any"), ("c1", "c.com", "/any")), rules)
    assert(got("a1") === ((Some(0L), false)))
    assert(got("a2") === ((Some(0L), false)))
    assert(got("b1") === ((Some(1L), true)))
    assert(got("c1") === ((None, true)))
  }

  test("parseRobots: group semantics, stacking, orphan rules, no-ops") {
    val files = Seq(
      // stacked UA incl. * → group applies; next UA after rules resets
      ("a.com", "User-agent: googlebot\nUser-agent: *\n" +
        "Disallow: /x\n\nUser-agent: bingbot\nDisallow: /y\n"),
      // orphan rules before any UA line are ignored; star later works
      ("b.com", "Disallow: /orphan\nUser-agent: *\nAllow: /ok\n"),
      // no star group at all → nothing
      ("c.com", "User-agent: googlebot\nDisallow: /z\n"),
      ("d.com", ""), ("e.com", null.asInstanceOf[String]))
      .toDF("host", "robots")
    val got = Frontier.parseRobots(files, "host", "robots")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set(("a.com", "disallow", "/x"),
      ("b.com", "allow", "/ok")))
  }

  test("parseRobots: truncation flag marks partially-parsed files") {
    // 3 header lines + 4 rules; maxLines=5 keeps the first two rules
    // and flags the file — the dropped Disallow lines are DETECTABLE,
    // not silently default-allowed
    val txt = "# hdr\nUser-agent: *\n\nAllow: /a\nAllow: /b\n" +
      "Disallow: /late1\nDisallow: /late2\n"
    val files = Seq(("t.com", txt), ("ok.com", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots")
    val got = Frontier.parseRobots(files, "host", "robots", maxLines = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getBoolean(3)))
      .toSet
    assert(got === Set(
      ("t.com", "allow", "/a", true), ("t.com", "allow", "/b", true),
      ("ok.com", "disallow", "/x", false)))
    // the raised default covers a realistic several-hundred-line file
    val big = "User-agent: *\n" +
      (1 to 500).map(i => s"Disallow: /p$i").mkString("\n") + "\n"
    val all = Frontier.parseRobots(
        Seq(("big.com", big)).toDF("host", "robots"), "host", "robots")
      .collect()
    assert(all.length === 500)
    assert(all.forall(!_.getBoolean(3)))
  }

  test("robotsGateKeyed: broadcastRules=false matches broadcast plan") {
    val urls = Seq(("u1", "a.com", "/d/1"), ("u2", "a.com", "/d/9"),
      ("u3", "b.com", "/x")).toDF("url", "host", "path")
    val rules = Seq(("a.com", "disallow", "/d/"), ("a.com", "allow", "/d/1"))
      .toDF("host", "rtype", "prefix")
    def verdicts(bc: Boolean) =
      Frontier.robotsGateKeyed(urls, rules, Nil, broadcastRules = bc)
        .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    val expect = Map("u1" -> true, "u2" -> false, "u3" -> true)
    assert(verdicts(bc = true) === expect)
    assert(verdicts(bc = false) === expect)
  }

  test("parseSitemap: block-first pairing, missing fields, order") {
    val xml = "<urlset>" +
      "<url><loc> http://a/1 </loc><lastmod>2026-01-02</lastmod></url>" +
      "<url><loc>http://a/2</loc></url>" + // no lastmod — must NOT
      "<url><lastmod>2026-03-04</lastmod></url>" + // steal the next one
      "<url><loc>http://a/3</loc><lastmod>2026-05-06</lastmod></url>" +
      "</urlset>"
    val got = Frontier.parseSitemap(
        Seq(("a.com", xml), ("b.com", ""),
          ("c.com", null.asInstanceOf[String])).toDF("host", "xml"),
        "host", "xml")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    // the loc-less block is dropped but still consumed its position
    assert(got.toSeq === Seq(
      ("a.com", 0L, "http://a/1", "2026-01-02"),
      ("a.com", 1L, "http://a/2", ""),
      ("a.com", 3L, "http://a/3", "2026-05-06")))
  }

  test("apportionBudget: exact total, remainder ranks, tie order") {
    // weights 5/3/2 over total 7: exact shares 3.5/2.1/1.4 →
    // floors 3/2/1 (sum 6), one leftover to the largest remainder
    // (.5 of host a)
    val got = Frontier.apportionBudget(
        Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("h", "w"),
        "h", "w", total = 7L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map("a" -> ((3L, 4L)), "b" -> ((2L, 2L)),
      "c" -> ((1L, 1L))))
    assert(got.values.map(_._2).sum === 7L)
    // equal weights, ties by key ascending; zero total allocates zero
    val tie = Frontier.apportionBudget(
        Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("h", "w"),
        "h", "w", total = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(tie === Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
    assert(Frontier.apportionBudget(
      Seq(("x", 1L)).toDF("h", "w"), "h", "w", total = 0L)
      .collect().head.getLong(3) === 0L)
  }

  test("politenessSlots: host-local sequence and slot boundaries") {
    val urls = (0 until 5).map(i => (s"http://a/$i", "a.com")) ++
      Seq(("http://b/x", "b.com"))
    val got = Frontier.politenessSlots(
        urls.toDF("url", "host"), perHostPerSlot = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("http://a/0") === ((0L, 0L)))
    assert(got("http://a/1") === ((1L, 0L)))
    assert(got("http://a/2") === ((2L, 1L)))
    assert(got("http://a/4") === ((4L, 2L)))
    assert(got("http://b/x") === ((0L, 0L))) // hosts are independent
  }

  test("trapReport: fanout explosion, path loops, healthy host clean") {
    val urls =
      (0 until 12).map(i => s"http://cal.x/c?sid=$i") ++     // 12 urls, 1 base
      Seq("http://ok.x/a/1", "http://ok.x/b/2",              // healthy
        "http://loop.x/a/b/a/b/c",                           // 2 surplus segs
        "http://loop.x/a/b/c",                               // 0 surplus
        "http://dup.x/p?q=1", "http://dup.x/p?q=1")          // dup collapses
    val got = Frontier.trapReport(urls.toDF("url"), "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got("cal.x") === ((12L, 1L, 1L, 0L, 12000000L, true)))
    assert(got("ok.x") === ((2L, 2L, 2L, 0L, 1000000L, false)))
    // one looping URL is enough to flag the host, fanout irrelevant
    assert(got("loop.x")._4 === 1L && got("loop.x")._6 === true)
    // exact duplicates collapse before counting — no self-fanout
    assert(got("dup.x") === ((1L, 1L, 1L, 0L, 1000000L, false)))
  }
}
