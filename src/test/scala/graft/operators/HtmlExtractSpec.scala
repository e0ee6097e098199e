package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(HtmlExtract.htmlToText(col("h")).as("t"))
      .collect().head.getString(0)

  test("htmlToText: scripts, styles, comments and CDATA vanish wholesale") {
    val t = extract("<p>keep</p><script>var a = '<p>no</p>';</script>" +
      "<style>p { color: red; }</style><!-- <p>gone</p> -->" +
      "<![CDATA[ <p>raw</p> ]]><p>also keep</p>")
    assert(t === "keep\nalso keep")
  }

  test("htmlToText: block tags break lines, inline tags become spaces") {
    val t = extract("<div>one <b>bold</b> word</div><p>two</p><br>three")
    assert(t === "one bold word\ntwo\nthree")
  }

  test("htmlToText: entities decode in the fixed order, amp last") {
    val t = extract("<p>&lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;" +
      "A&amp;B &amp;lt; stays-encoded-once</p>")
    // &amp;lt; must become &lt; (single decode), never '<'
    assert(t === "<tag> \"q\" 'a' A&B &lt; stays-encoded-once")
  }

  test("htmlToText: prose comparisons survive, markup-shaped spans do not") {
    val t = extract("<p>1 < 2 and x > y</p><p>a <b>real</b> tag</p>")
    assert(t === "1 < 2 and x > y\na real tag")
  }

  test("htmlToText: unclosed and nested tags degrade without data loss") {
    // unclosed <p>, mis-nested <b><i></b></i>: tag STRIPPING is not a
    // parser — every tag token dies, all text survives
    val t = extract("<p>open<p>again <b><i>deep</b></i> end")
    assert(t === "open\nagain deep end")
  }

  test("htmlToText: nested block structure yields one line per leaf block") {
    val t = extract("<div><ul><li>a b</li><li>c d</li></ul></div><p>e</p>")
    assert(t === "a b\nc d\ne")
  }

  test("htmlToText: unterminated comment degrades to visible text, not loss") {
    // the comment rule needs '-->'; without it the '<!--' token is not
    // a tag (no letter after '<') so it SURVIVES as prose and the
    // payload text is kept — degraded output over silent data loss
    val t = extract("<p>before</p><!-- never closed <p>x</p>")
    assert(t === "before\n<!-- never closed\nx")
  }

  test("htmlBlocks: link density and word mass are exact") {
    val df = Seq((1L,
      "<div><a href=\"/\">Home</a> | <a href=\"/x\">About us</a></div>" +
        "<p>six words of plain body text</p>")).toDF("id", "h")
    val rows = HtmlExtract.htmlBlocks(df, "id", "h")
      .orderBy("block_id").collect()
    assert(rows.length === 2)
    val nav = rows.head
    // text "Home | About us" (15 chars), links "Home About us" (13)
    assert(nav.getAs[String]("text") === "Home | About us")
    assert(nav.getAs[Long]("n_chars") === 15L)
    assert(nav.getAs[Long]("n_link_chars") === 13L)
    assert(nav.getAs[Long]("link_ppm") === 13L * 1000000L / 15L)
    val body = rows.last
    assert(body.getAs[Long]("n_words") === 6L)
    assert(body.getAs[Long]("n_link_chars") === 0L)
  }

  test("htmlBlocks: anchors spanning inline markup count their full text") {
    val df = Seq((1L,
      "<p><a href=\"/x\">two <b>styled</b> words</a> trailing prose here</p>"))
      .toDF("id", "h")
    val r = HtmlExtract.htmlBlocks(df, "id", "h").collect().head
    assert(r.getAs[String]("text") === "two styled words trailing prose here")
    assert(r.getAs[Long]("n_link_chars") === "two styled words".length.toLong)
  }

  test("extractContent: boilerplate drops, body survives in source order") {
    val df = Seq((1L,
      "<div><a href=\"/\">Home</a> <a href=\"/b\">About</a></div>" +
        "<p>first paragraph with at least five words</p>" +
        "<h1>Short head</h1>" +
        "<p>second paragraph also has enough words</p>" +
        "<div>(c) <a href=\"/t\">Terms</a></div>")).toDF("id", "h")
    val r = HtmlExtract
      .extractContent(df, "id", "h", maxLinkPpm = 330000L, minWords = 5L)
      .collect().head
    assert(r.getAs[Long]("n_blocks") === 5L)
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[String]("content") ===
      "first paragraph with at least five words\n" +
        "second paragraph also has enough words")
  }

  test("extractContent: all-boilerplate page yields empty content, not no row") {
    val df = Seq((1L, "<div><a href=\"/\">Only nav</a></div>")).toDF("id", "h")
    val r = HtmlExtract.extractContent(df, "id", "h").collect().head
    assert(r.getAs[Long]("n_kept") === 0L)
    assert(r.getAs[String]("content") === "")
  }

  test("extractLinks: document order, commented-out and quoted contract") {
    val df = Seq((1L,
      "<!-- <a href=\"http://dead.example/x\"> -->" +
        "<p><a href=\"http://a.example/1\">a</a>" +
        "<a href='http://sq.example/skip'>sq</a>" +
        "<a class=\"x\" href=\"/rel/2\" target=\"_b\">b</a></p>" +
        "<script>var s = '<a href=\"http://js.example/no\">';</script>"))
      .toDF("id", "h")
    val got = HtmlExtract.extractLinks(df, "id", "h")
      .orderBy("link_idx").collect()
      .map(r => (r.getAs[Long]("link_idx"), r.getAs[String]("href"))).toSeq
    // commented, single-quoted, and script-embedded hrefs never extract
    assert(got === Seq((0L, "http://a.example/1"), (1L, "/rel/2")))
  }

  test("extractLinks: linkless and null pages emit no rows") {
    val df = Seq((1L, Some("<p>no links</p>")), (2L, None))
      .toDF("id", "h")
    assert(HtmlExtract.extractLinks(df, "id", "h").count() === 0L)
  }

  test("extractAnchors: href + cleaned inner text, quoting contract") {
    val df = Seq((1L,
      "<p><a href=\"http://a/1\">First  <b>bold</b></a>" +
        "<a href='http://skip/sq'>sq</a>" +
        "<a class=\"x\" href=\"http://a/2\" rel=\"nofollow\">&lt;2&gt;</a>" +
        "<!-- <a href=\"http://dead/\">gone</a> -->" +
        "<a href=\"http://a/3\"></a></p>")).toDF("id", "h")
    val got = HtmlExtract.extractAnchors(df, "id", "h")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (0L, "http://a/1", "First bold"),   // inline tag stripped, ws collapsed
      (1L, "http://a/2", "<2>"),          // entities decode in anchor text
      (2L, "http://a/3", "")))            // empty anchor body survives as ""
  }

  test("extractHeadMeta: missing fields empty, fallback chain, quoting") {
    val df = Seq(
      (1L, "<head><title>T1</title></head>"),
      (2L, "<head><meta property=\"og:title\" content=\"OG2\">" +
        "<title>T2</title></head>"),
      (3L, "<head><meta name='description' content='sq'></head>"),
      (4L, "<body>no head at all</body>")).toDF("id", "h")
    val got = HtmlExtract.extractHeadMeta(df, "id", "h")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(5)))).toMap
    assert(got(1L) === (("T1", "", "T1")))
    assert(got(2L) === (("T2", "", "OG2")))   // og:title wins display
    assert(got(3L) === (("", "", "")))        // single quotes skipped
    assert(got(4L) === (("", "", "")))
  }

  test("robotsMeta: token boundaries, casing, commented-out meta") {
    val df = Seq(
      (1L, "<head><meta name=\"robots\" content=\"NOINDEX , nofollow\"></head>"),
      (2L, "<head><meta name=\"robots\" content=\"re-noindex,nofollowed\"></head>"),
      (3L, "<head><!-- <meta name=\"robots\" content=\"noindex\"> --></head>"),
      (4L, "<head></head>")).toDF("id", "h")
    val got = HtmlExtract.robotsMeta(df, "id", "h")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((true, true)))   // case-folded, spaced tokens
    assert(got(2L) === ((false, false))) // boundary traps
    assert(got(3L) === ((false, false))) // comments stripped first
    assert(got(4L) === ((false, false)))
  }

  test("extractHreflang: case-folds lang, skips commented/scripted links") {
    val df = Seq(
      (1L, "<head><link rel=\"alternate\" hreflang=\"EN-us\" href=\"http://x/en\">" +
        "<link rel=\"alternate\" hreflang=\"de\" href=\"http://x/de\">" +
        "<!-- <link rel=\"alternate\" hreflang=\"fr\" href=\"http://x/fr\"> -->" +
        "<link rel=\"stylesheet\" href=\"http://x/css\"></head>"),
      (2L, "<script>'<link rel=\"alternate\" hreflang=\"zh\" " +
        "href=\"http://x/zh\">'</script>")).toDF("id", "h")
    val got = HtmlExtract.extractHreflang(df, "id", "h")
      .orderBy("id", "alt_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, "en-us", "http://x/en"),   // lang case-folds, href verbatim
      (1L, 1L, "de", "http://x/de")))     // comment + script + stylesheet skip
  }

  test("spamSignals: hidden text detected, commented-out exempt, stuffing gated") {
    val stuffed = (1 to 30).map(_ => "buy").mkString(" ")
    val df = Seq(
      (1L, "<p>normal words here one two three four five six seven " +
        "eight nine ten eleven twelve thirteen fourteen</p>" +
        "<div style=\"DISPLAY: None\">sneaky hidden spam</div>"),
      (2L, "<!-- <div style=\"display:none\">ghost</div> --><p>clean " +
        "a b c d e f g h i j k l m n o p q r s t</p>"),
      (3L, s"<p>$stuffed and some other words to cross the floor " +
        "one two three</p>"),
      (4L, "<p>menu menu menu</p>")) // 100% one token but < minToks
      .toDF("id", "h")
    val got = HtmlExtract.spamSignals(df, "id", "h")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_hidden_tokens"), r.getAs[Boolean]("hidden"),
          r.getAs[Boolean]("stuffed")))).toMap
    assert(got(1L) === ((3L, true, false)))  // case-folded display:none
    assert(got(2L) === ((0L, false, false))) // commented-out is dead
    assert(got(3L)._3 === true)              // 30/38 > 22%
    assert(got(4L) === ((0L, false, false))) // short-page exemption
    // hidden tokens are EXCLUDED from the visible stuffing base
    val h = HtmlExtract.spamSignals(df, "id", "h")
      .filter(col("doc_id") === 1L).collect().head
    assert(h.getAs[Long]("n_toks") === 17L)
  }

  test("extractContent survives the adversarial torture shapes") {
    // the q425 fixture for one doc, block-by-block (shapes: unclosed
    // tags, nested tables, mixed quotes, attr containing '>', comment
    // hiding a script, CDATA hiding markup, double-encoded entities,
    // link-dense nav, br soup, minWords boundary at EOF)
    val nav = "<nav>" + (0 until 12)
      .map(i => s"""<a href="/n$i">nav item $i</a>""").mkString(" ") +
      "</nav>"
    val html = "<HTML><HEAD><TITLE>T7 &amp;lt;x&amp;gt;</TITLE>" +
      "<style media=screen>p{color:red} .x{display:none}</style>" +
      "<script>var s = \"</p>\"; if (1<2) track();</script>" +
      "</head><body>" +
      "<!-- <p>ghost 7</p><script>evil()</script> -->" +
      "<![CDATA[<p>cdata 7</p>]]>" + nav +
      "<P CLASS='m' title=\"a>b\">Intro 7 says 1 < 2 plainly and keeps seven words" +
      "<table><tr><td>outer 2 <table><tr><td>inner nested cell keeps these six words</td></tr></table></td></tr></table>" +
      "alpha<br>beta<BR/>gamma delta epsilon zeta eta theta" +
      "<p><a href=\"/t/7\">t1</a> <a href='u'>t2</a></p>" +
      "<p>&amp; &bogus; A &nbsp;B with words enough to pass the filter today</p>" +
      "<div>closing words run out here</body></html>"
    val r = HtmlExtract.extractContent(
        Seq((7L, html)).toDF("id", "h"), "id", "h")
      .collect().head
    // kept, in source order: the unclosed-P block (attribute's '>'
    // leaks 'b">' as text — the documented regex contract), the inner
    // table cell, the post-br run, the entity paragraph (unknown
    // entity literal, &amp;→&, &nbsp;→space), and the EOF block at
    // exactly minWords=5
    assert(r.getAs[String]("content") ===
      """b">Intro 7 says 1 < 2 plainly and keeps seven words
        |inner nested cell keeps these six words
        |gamma delta epsilon zeta eta theta
        |& &bogus; A B with words enough to pass the filter today
        |closing words run out here""".stripMargin)
    // skipped: title (2 words, double-encoded entities stay encoded
    // once), nav (link_ppm 1e6), "outer 2", "alpha", "beta", tag
    // cloud; ghost/evil/cdata/style/script text appears NOWHERE
    assert(r.getAs[Long]("n_kept") === 5L)
    assert(r.getAs[Long]("n_blocks") === 11L)
    assert(!r.getAs[String]("content").contains("ghost"))
    assert(!r.getAs[String]("content").contains("evil"))
    assert(!r.getAs[String]("content").contains("cdata"))
    assert(!r.getAs[String]("content").contains("color:red"))
  }

  test("htmlToText: null html extracts to null, empty to empty") {
    val df = Seq(Some("<p></p>"), None)
      .toDF("h").select(HtmlExtract.htmlToText(col("h")).as("t"))
    val got = df.collect().map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(Some(""), None))
  }
}
