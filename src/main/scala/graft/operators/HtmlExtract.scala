package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-side text extraction: HTML → clean text → content blocks →
  * boilerplate-stripped document text. The front door of a pretraining
  * data pipeline — everything downstream (C4/Gopher quality rules,
  * dedup, tokenization) is defined over the text this stage produces.
  *
  * The reference has no analog (its inputs are pre-extracted JSON-RPC
  * payloads); the design follows the published boilerplate-removal
  * heuristics (Kohlschütter et al. 2010, "Boilerplate Detection using
  * Shallow Text Features"): segment the page into BLOCKS at block-level
  * tag boundaries, score each block by text mass and LINK DENSITY
  * (anchor-text chars / text chars), and keep only blocks that look
  * like body copy. Navigation chrome, footers, and tag clouds are
  * exactly the blocks that are short or link-dominated.
  *
  * Everything here is deterministic regex/string algebra over shared
  * Java-regex/RE2-compatible patterns (no backreferences, no lookahead)
  * so the whole stage hash-gates against a DuckDB oracle, and every
  * function is a pure projection built from `functions._` — codegen'd,
  * scan-speed, shuffle-free. The only shuffle in the whole extraction
  * pipeline is [[extractContent]]'s per-document reassembly groupBy,
  * keyed by doc id — at 100 TB that is one partial-agg shuffle whose
  * payload is already-cleaned text, strictly smaller than the input
  * HTML.
  */
object HtmlExtract {

  /** Non-content spans removed wholesale before any text extraction.
    * `(?s)` so payloads spanning lines die too; lazy bodies so
    * adjacent spans don't fuse. RE2 and Java agree on all of these.
    */
  val cdataPat: String = "(?s)<!\\[CDATA\\[.*?\\]\\]>"
  val commentPat: String = "(?s)<!--.*?-->"
  val scriptPat: String = "(?is)<script\\b[^>]*>.*?</script>"
  val stylePat: String = "(?is)<style\\b[^>]*>.*?</style>"

  /** Block-LEVEL tags (open or close) — the segmentation boundaries.
    * Replaced by newline, so consecutive/nested boundaries collapse
    * into empty blocks that are dropped downstream.
    */
  val blockTagPat: String =
    "(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "section|article|aside|main|header|footer|nav|blockquote|pre|form|" +
      "fieldset|hr|title)\\b[^>]*>"

  /** Any remaining markup (inline tags, DOCTYPE, closers) → space.
    * Requires a letter / `!` / `/` after `<` so stray comparisons in
    * prose ("1 < 2") survive as text.
    */
  val anyTagPat: String = "(?s)<[!/]?[a-zA-Z][^>]*>"

  /** Anchor inner HTML (group 1) — the link-density numerator. */
  val anchorPat: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Double-quoted href value (group 1). The contract is
    * double-quoted attributes only — the regex algebra has no
    * backtracking-safe way to pair mixed quote styles, and crawl
    * extractors standardly normalize quoting upstream; single-quoted
    * and unquoted hrefs are skipped, never mis-parsed.
    */
  val hrefPat: String = "(?is)<a\\b[^>]*\\bhref\\s*=\\s*\"([^\"]+)\"[^>]*>"

  /** ASCII entity subset, decode order fixed with `&amp;` LAST (the
    * standard order: decoding it first would double-decode `&amp;lt;`).
    */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip CDATA, comments, script and style payloads (in that fixed
    * order — a script inside a comment is gone before the script rule
    * looks at it, and both engines apply the same order).
    */
  def dropNonContent(c: Column): Column =
    Seq(cdataPat, commentPat, scriptPat, stylePat)
      .foldLeft(c)((x, p) => regexp_replace(x, p, " "))

  /** Literal (non-regex) entity decode chain. */
  def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (x, (k, v)) => replace(x, lit(k), lit(v)) }

  /** Clean a fragment expected to yield ONE line: strip tags, decode
    * entities, collapse all whitespace to single spaces, trim.
    */
  def inlineText(c: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(c, anyTagPat, " ")),
      "\\s+", " "))

  /** Whole-document extraction: non-content spans out, block tags →
    * newline, inline tags → space, entities decoded, horizontal
    * whitespace collapsed, blank lines squeezed — one line per
    * source block, newline-separated, trimmed.
    */
  def htmlToText(c: Column): Column = {
    val seg = regexp_replace(dropNonContent(c), blockTagPat, "\n")
    val txt = decodeEntities(regexp_replace(seg, anyTagPat, " "))
    val collapsed = regexp_replace(
      regexp_replace(txt, "[ \\t]+", " "), " ?\\n ?", "\n")
    trim(regexp_replace(collapsed, "\\n+", "\n"), " \n\t")
  }

  /** Segment documents into scored blocks: one output row per
    * non-empty block with its position (`block_id`, stable 0-based
    * pre-filter position so downstream reassembly preserves document
    * order), clean `text`, `n_chars`, `n_words`, `n_link_chars`
    * (anchor-text mass) and `link_ppm` (integer link density — ppm so
    * the score hash-gates). Pure projection + one explode; the
    * per-block work is bounded by block length.
    */
  def htmlBlocks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val pre = regexp_replace(dropNonContent(col(htmlCol)), blockTagPat, "\n")
    df
      .select(col(idCol),
        posexplode(split(pre, "\\n")).as(Seq("block_id", "raw")))
      .select(col(idCol), col("block_id").cast("long").as("block_id"),
        col("raw"), inlineText(col("raw")).as("text"),
        inlineText(array_join(
          regexp_extract_all(col("raw"), lit(anchorPat), lit(1)), " "))
          .as("__link_text"))
      .filter(length(col("text")) > 0)
      .select(col(idCol), col("block_id"), col("text"),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(col("__link_text")).cast("long").as("n_link_chars"))
      .withColumn("link_ppm",
        expr("n_link_chars * 1000000L div n_chars"))
  }

  /** Outlink extraction — the crawl-frontier feed: one row per
    * double-quoted href in document order, (id, link_idx, href),
    * non-content spans (commented-out markup, scripts) dropped
    * FIRST so dead links never enter the frontier. Pure projection +
    * one explode; compose with [[graft.functions.Urls]] for
    * canonicalization and host-graph construction.
    */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(dropNonContent(col(htmlCol)),
          lit(hrefPat), lit(1))).as(Seq("link_idx", "href")))
      .withColumn("link_idx", col("link_idx").cast("long"))

  /** Full anchor element with a double-quoted href — href value in
    * group 1, inner HTML in group 2. Same quoting contract as
    * [[hrefPat]]; lazy body so adjacent anchors don't fuse.
    */
  val anchorElemPat: String =
    "(?is)<a\\b[^>]*\\bhref\\s*=\\s*\"([^\"]+)\"[^>]*>(.*?)</a>"

  /** Anchor extraction — (id, link_idx, href, anchor): one row per
    * double-quoted-href anchor in document order, with the anchor's
    * inner HTML cleaned to one line ([[inlineText]]). The inbound
    * half of the web's oldest relevance signal: aggregated per TARGET
    * url, anchor text is a peer-written description of the page
    * (the "anchor text document" of classic IR). Pure projection +
    * one explode, exactly [[extractLinks]]'s shape.
    */
  def extractAnchors(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(dropNonContent(col(htmlCol)),
          lit(anchorElemPat), lit(0))).as(Seq("link_idx", "elem")))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        regexp_extract(col("elem"), anchorElemPat, 1).as("href"),
        inlineText(regexp_extract(col("elem"), anchorElemPat, 2))
          .as("anchor"))

  /** Head-metadata patterns — double-quoted attributes, fixed
    * attribute order (name/property/rel before content/href), the
    * same quoting contract as [[hrefPat]].
    */
  val titlePat: String = "(?is)<title\\b[^>]*>(.*?)</title>"
  val metaDescPat: String =
    "(?is)<meta\\s+name=\"description\"\\s+content=\"([^\"]*)\""
  val ogTitlePat: String =
    "(?is)<meta\\s+property=\"og:title\"\\s+content=\"([^\"]*)\""
  val canonicalPat: String =
    "(?is)<link\\s+rel=\"canonical\"\\s+href=\"([^\"]+)\""

  /** Document head metadata — (id, title, meta_desc, og_title,
    * canonical, display_title): first match of each pattern over the
    * non-content-stripped page, inner text cleaned to one line;
    * `display_title` is the indexing fallback chain og:title →
    * `<title>` → "". Pure projection, rides the scan.
    */
  def extractHeadMeta(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val h = dropNonContent(col(htmlCol))
    def first(pat: String) = inlineText(regexp_extract(h, pat, 1))
    val title = first(titlePat)
    val og = first(ogTitlePat)
    df.select(col(idCol), title.as("title"),
        first(metaDescPat).as("meta_desc"), og.as("og_title"),
        regexp_extract(h, canonicalPat, 1).as("canonical"))
      .withColumn("display_title",
        when(col("og_title") =!= "", col("og_title"))
          .otherwise(col("title")))
  }

  /** Robots META directives — the in-PAGE half of REP (robots.txt is
    * the fetch-side half, [[Frontier]]): `<meta name="robots"
    * content="...">` token flags. Token-boundary matching, not
    * substring ("nofollow" must not light up "noindex" etc. — the
    * value is a comma-separated token list per the spec).
    */
  val robotsMetaPat: String =
    "(?is)<meta\\s+name=\"robots\"\\s+content=\"([^\"]*)\""

  def robotsMeta(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val value = lower(trim(regexp_extract(
      dropNonContent(col(htmlCol)), robotsMetaPat, 1)))
    def flag(tok: String) =
      value.rlike(s"(^|,)\\s*$tok\\s*(,|$$)")
    df.select(col(idCol), value.as("robots"),
      flag("noindex").as("noindex"), flag("nofollow").as("nofollow"))
  }

  /** hreflang alternates — (id, alt_idx, hreflang, href) per
    * `<link rel="alternate" hreflang="…" href="…">`, the multilingual
    * cluster declaration (a page SHOULD list itself and every
    * language variant, and variants must reciprocate or search
    * engines ignore the cluster — which is exactly what the q371
    * reciprocity audit measures). Same element-first extraction as
    * [[extractAnchors]].
    */
  val hreflangPat: String =
    "(?is)<link\\s+rel=\"alternate\"\\s+hreflang=\"([a-zA-Z-]+)\"\\s+href=\"([^\"]+)\""

  def extractHreflang(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(dropNonContent(col(htmlCol)),
          lit(hreflangPat), lit(0))).as(Seq("alt_idx", "__e")))
      .select(col(idCol), col("alt_idx").cast("long").as("alt_idx"),
        lower(regexp_extract(col("__e"), hreflangPat, 1)).as("hreflang"),
        regexp_extract(col("__e"), hreflangPat, 2).as("href"))

  /** Hidden-element contract: an opening tag whose inline style
    * carries `display:none`, inner content up to the FIRST closing
    * tag (non-greedy — nested markup inside a hidden element is out
    * of contract, the price of staying RE2-compatible: backreferences
    * to pair the exact tag don't exist there).
    */
  val hiddenPat: String =
    "(?is)<[a-z]+[^>]*style=\"[^\"]*display:\\s*none[^\"]*\"[^>]*>.*?</[a-z]+>"

  /** Search-spam signals per page, the two classic on-page cloaking
    * tells (Gyöngyi & Garcia-Molina's web-spam taxonomy):
    *  - HIDDEN TEXT: content inside `display:none` elements
    *    ([[hiddenPat]]) — chars + token count, `hidden` when any;
    *  - KEYWORD STUFFING: max single-token share of the VISIBLE text
    *    (hidden spans removed first, so stuffing can't hide) in
    *    integer ppm; `stuffed` when ≥ `stuffPpm` over at least
    *    `minToks` tokens (short pages exempt — a 5-token nav page
    *    isn't "stuffing" its menu word).
    *
    * Shape: one projection + one token explode + two partial aggs
    * keyed (doc, token) then (doc) — linear, shuffle keyed by doc.
    */
  def spamSignals(df: DataFrame, idCol: String, htmlCol: String,
      stuffPpm: Long = 220000L, minToks: Long = 20L): DataFrame = {
    val hc = dropNonContent(col(htmlCol))
    val base = df.select(col(idCol).as("doc_id"),
      inlineText(array_join(
        regexp_extract_all(hc, lit(hiddenPat), lit(0)), " ")).as("__ht"),
      inlineText(regexp_replace(hc, hiddenPat, " ")).as("__vis"))
    val hid = base.select(col("doc_id"),
      length(col("__ht")).cast("long").as("n_hidden_chars"),
      TextAnalysis.nTokens(col("__ht")).cast("long")
        .as("n_hidden_tokens"),
      col("__vis"))
    val tf = hid
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("__vis")))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val top = tf.groupBy(col("doc_id"))
      .agg(max(col("tf")).as("max_tf"), sum(col("tf")).as("n_toks"))
    hid.drop("__vis")
      .join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_hidden_chars"),
        col("n_hidden_tokens"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(expr("max_tf * 1000000L div n_toks"), lit(0L))
          .as("top_tf_ppm"))
      .withColumn("hidden", col("n_hidden_tokens") > 0)
      .withColumn("stuffed",
        col("top_tf_ppm") >= stuffPpm && col("n_toks") >= minToks)
  }

  /** The boilerplate rule: a block is CONTENT iff its link density is
    * at or below `maxLinkPpm` AND it carries at least `minWords`
    * words. Navigation bars fail the first test, headers/footers/
    * copyright lines the second.
    */
  def contentRule(maxLinkPpm: Long, minWords: Long): Column =
    col("link_ppm") <= maxLinkPpm && col("n_words") >= minWords

  /** End-to-end: HTML in, boilerplate-stripped document text out,
    * with the audit counts (`n_blocks` seen, `n_kept` surviving).
    * Blocks are reassembled in source order (array_sort over
    * (block_id, text) structs — block_id leads, so the sort IS the
    * document order) and joined by newline. One groupBy(doc) shuffle;
    * everything else rides the scan.
    */
  def extractContent(df: DataFrame, idCol: String, htmlCol: String,
      maxLinkPpm: Long = 330000L, minWords: Long = 5L): DataFrame = {
    val keep = contentRule(maxLinkPpm, minWords)
    htmlBlocks(df, idCol, htmlCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(keep, struct(col("block_id"), col("text"))))),
            x => x.getField("text")),
          "\n").as("content"))
  }
}
