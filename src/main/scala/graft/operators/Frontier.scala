package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-frontier admission control — the step between outlink
  * extraction ([[HtmlExtract.extractLinks]] → [[graft.functions.Urls]]
  * canonicalization) and fetch scheduling. The reference has no analog
  * (its inputs arrive over JSON-RPC); the semantics follow the
  * Robots Exclusion Protocol (RFC 9309 §2.2.2): among all rules whose
  * path prefix matches the URL's path, the LONGEST prefix wins, and an
  * Allow beats a Disallow of equal length; a URL with no matching rule
  * is allowed.
  *
  * 100 TB shape: the rules table is robots.txt-derived — a few rules
  * per HOST, millions of hosts at web scale but still orders of
  * magnitude smaller than the frontier — so the join is host-keyed and
  * broadcast when the rule set fits, a plain equi-join otherwise. The
  * longest-match resolution is a single integer MAX per URL (rank =
  * 2·prefix_len + isAllow, decided by parity), so it partial-aggregates
  * map-side: no per-URL rule list ever materializes.
  */
object Frontier {

  /** Evaluate robots rules over a frontier.
    *
    * @param urls  (url, host, path) — `url` unique, `host` already
    *              [[graft.functions.Urls.host]]-normalized, `path` the
    *              [[graft.functions.Urls.path]] component.
    * @param rules (host, rtype, prefix) — `rtype` is `allow` or
    *              `disallow`; `prefix` a path prefix (empty matches
    *              every path, the `Disallow: /`-equivalent is "/").
    * @return urls + `rule_rank` (2·len+isAllow of the winning rule,
    *         null when no rule matched) + `allowed`.
    */
  def robotsGate(urls: DataFrame, rules: DataFrame): DataFrame =
    robotsGateKeyed(urls, rules, Nil)

  /** [[robotsGate]] preserving caller-provided key columns — the
    * per-(document, link) form: the same URL appearing under many
    * documents gets an independent row per key, so the evaluation is
    * a pure per-row decision (no cross-row state) and therefore runs
    * identically per micro-batch in a stream (q343) and over the
    * whole corpus in batch. `keyCols ++ (url)` must be unique —
    * duplicate rows would silently merge in the verdict groupBy.
    * `rtype` values other than `allow` count as disallow.
    *
    * `broadcastRules` (default true) hints the rules side broadcast —
    * right for the common case of a crawl-cycle rule set that fits in
    * memory. A web-scale rules table (millions of hosts × rules) must
    * pass false: the join then stays a host-keyed equi-join and AQE
    * decides the physical strategy from actual sizes.
    */
  def robotsGateKeyed(urls: DataFrame, rules: DataFrame,
      keyCols: Seq[String], broadcastRules: Boolean = true): DataFrame = {
    val r = rules.select(col("host"), col("rtype").as("__rtype"),
      col("prefix").as("__prefix"))
    val hit = col("__prefix").isNotNull &&
      col("path").startsWith(col("__prefix"))
    urls.join(if (broadcastRules) broadcast(r) else r, Seq("host"), "left")
      .groupBy((keyCols ++ Seq("url", "host", "path")).map(col): _*)
      .agg(max(when(hit, length(col("__prefix")).cast("long") * 2 +
          when(col("__rtype") === "allow", 1L).otherwise(0L)))
        .as("rule_rank"))
      // default-allow: no matching rule coalesces to rank 1 (odd);
      // parity of the winning rank IS the verdict
      .withColumn("allowed",
        coalesce(col("rule_rank"), lit(1L)) % 2 === 1)
  }

  /** Parse raw robots.txt text into the (host, rtype, prefix) rules
    * [[robotsGate]] consumes — the fetch-side half of REP support.
    * Scope: the `User-agent: *` group(s), per RFC 9309 §2.2.1 group
    * semantics: consecutive User-agent lines STACK to open one group
    * (so `User-agent: googlebot` + `User-agent: *` applies); a
    * specific-agent-only group's rules are ignored; keys are
    * case-insensitive; `#` comments and blank lines are stripped;
    * an EMPTY Allow/Disallow value is a no-op by spec (it does NOT
    * mean "disallow everything" — that is `Disallow: /`), which
    * matters because the evaluator treats an empty prefix as
    * match-all.
    *
    * One bounded catalyst fold over each file's line array (the
    * [[Warc.parseRecords]] discipline — group state is inherently
    * sequential per FILE, files parallelize freely); `maxLines`
    * bounds the fold (the fold is a runtime higher-order `aggregate`,
    * not an unrolled expression tree, so the bound costs nothing at
    * plan time). Default 1024 covers real robots.txt files, which
    * commonly run to hundreds of lines. Emits one row per accepted
    * rule in file order, plus `truncated` — true when the file had
    * MORE lines than `maxLines`, so a caller can detect a partially
    * parsed file instead of silently default-allowing the URLs its
    * dropped Disallow lines covered. (A truncated file whose bounded
    * prefix yields zero rules emits zero rows either way; callers
    * auditing for that compute `size(split(txt,'\n')) > maxLines`
    * on the raw file frame.)
    */
  def parseRobots(df: DataFrame, hostCol: String, txtCol: String,
      maxLines: Int = 1024): DataFrame = {
    require(maxLines >= 1, s"maxLines must be >= 1, got $maxLines")
    val lines = split(coalesce(col(txtCol), lit("")), "\n")
    val init = struct(lit(1).as("ua"), lit(0).as("act"),
      array().cast("array<struct<rtype:string,prefix:string>>")
        .as("rules"))
    val folded = aggregate(
      sequence(lit(1), lit(maxLines)), init,
      (st, i) => {
        val raw = when(i <= size(lines), element_at(lines, i))
          .otherwise(lit(""))
        val line = trim(regexp_replace(raw, "#.*$", ""))
        val key = lower(regexp_extract(line, "^([A-Za-z-]+)\\s*:", 1))
        val value = trim(regexp_extract(line, "^[A-Za-z-]+\\s*:(.*)$", 1))
        val isUa = key === "user-agent"
        val isRule = key === "allow" || key === "disallow"
        // consecutive UA lines stack; the first UA after rules (or at
        // start) RESETS the group
        val actAfterUa = when(st.getField("ua") === 1,
          greatest(st.getField("act"),
            when(value === "*", 1).otherwise(0)))
          .otherwise(when(value === "*", 1).otherwise(0))
        val appended = when(
          isRule && st.getField("act") === 1 && value =!= "",
          concat(st.getField("rules"),
            array(struct(key.as("rtype"), value.as("prefix")))))
          .otherwise(st.getField("rules"))
        when(isUa,
          struct(lit(1).as("ua"), actAfterUa.as("act"),
            st.getField("rules").as("rules")))
          .when(isRule,
            struct(lit(0).as("ua"), st.getField("act").as("act"),
              appended.as("rules")))
          .otherwise( // blank/comment/unknown key: group state holds
            struct(st.getField("ua").as("ua"),
              st.getField("act").as("act"),
              st.getField("rules").as("rules")))
      })
    df.select(col(hostCol).as("host"),
        (size(lines) > maxLines).as("truncated"),
        explode(folded.getField("rules")).as("r"))
      .select(col("host"), col("r.rtype").as("rtype"),
        col("r.prefix").as("prefix"), col("truncated"))
  }

  /** Sitemap parsing — the DISCOVERY side of the frontier (robots is
    * the admission side): one row per `<url>` block in document
    * order, with its `<loc>` and optional `<lastmod>`. Block-first
    * extraction (extract `<url>…</url>` spans, then fields within
    * each) so a missing lastmod can never mis-pair with the next
    * block's. Pure projection + one explode, the [[HtmlExtract
    * .extractLinks]] shape.
    */
  def parseSitemap(df: DataFrame, hostCol: String, xmlCol: String)
      : DataFrame = {
    val blockPat = "(?is)<url>(.*?)</url>"
    df.select(col(hostCol),
        posexplode(regexp_extract_all(
          coalesce(col(xmlCol), lit("")), lit(blockPat), lit(1)))
          .as(Seq("url_idx", "__b")))
      .select(col(hostCol), col("url_idx").cast("long").as("url_idx"),
        trim(regexp_extract(col("__b"), "(?is)<loc>(.*?)</loc>", 1))
          .as("loc"),
        trim(regexp_extract(col("__b"),
          "(?is)<lastmod>(.*?)</lastmod>", 1)).as("lastmod"))
      .filter(col("loc") =!= "")
  }

  /** Exact crawl-budget apportionment — Hamilton's largest-remainder
    * method over host weights: every host gets ⌊total·w/Σw⌋ fetches,
    * and the leftover (total − Σ floors < #hosts) goes one-each to
    * the largest remainders, ties to the smaller host. The result
    * sums to `total` EXACTLY — no float shares, no rounding drift —
    * which is the point: a crawl cycle that over- or under-allocates
    * by "rounding" either wastes fetch capacity or breaks politeness
    * budgets. The remainder rank is a window over the HOST frame
    * (dimension-sized, never data-sized); both scalar attaches ride
    * 1-row broadcasts.
    */
  def apportionBudget(weights: DataFrame, keyCol: String,
      weightCol: String, total: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(total >= 0, s"total must be >= 0, got $total")
    val w = weights.select(col(keyCol), col(weightCol).cast("long")
      .as("__w"))
    val s = w.agg(sum(col("__w")).as("__s"))
    val based = w.crossJoin(broadcast(s))
      .withColumn("base", expr(s"(${total}L * __w) div __s"))
      .withColumn("__rem", expr(s"(${total}L * __w) % __s"))
    val left = based.agg((lit(total) - sum(col("base"))).as("__left"))
    based.crossJoin(broadcast(left))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(keyCol))).cast("long"))
      .withColumn("budget",
        col("base") + when(col("__rk") <= col("__left"), 1L)
          .otherwise(0L))
      .select(col(keyCol), col("__w").as("weight"), col("base"),
        col("budget"))
  }

  /** Politeness scheduling: deterministic per-host fetch ordering and
    * slot assignment — `fetch_seq` = 0-based rank of the URL within
    * its host (by URL order), `fetch_slot` = ⌊seq/perHostPerSlot⌋, so
    * a fetcher draining one slot per politeness interval hits each
    * host at most `perHostPerSlot` times per interval. The window is
    * HOST-partitioned — the scalable axis: hosts spread across
    * executors, and no host's queue is longer than its own URL count.
    *
    * Caller contract: `urls` is pre-deduplicated per host (q331's
    * distinct) — duplicate URL rows would draw arbitrary distinct
    * sequence numbers and make the output run-dependent.
    */
  /** Crawler-trap report per host — the two classic infinite-space
    * signals (Heydon & Najork's Mercator taxonomy):
    *  - PARAMETER EXPLOSION: distinct URLs per distinct query-stripped
    *    base (`fanout_ppm`, integer ppm) — calendars and session ids
    *    mint unbounded URLs over a handful of real pages;
    *  - PATH LOOPS: URLs whose path repeats segments (≥ `loopRepeats`
    *    surplus occurrences, i.e. |segs| − |distinct segs|) — the
    *    /a/b/a/b/… self-similar descent of a relative-link cycle.
    * `is_trap` = fanout at/above `fanoutPpm` OR any looping URL; a
    * frontier scheduler demotes or caps flagged hosts.
    *
    * Scale: one URL-level distinct (the frontier is already keyed by
    * url), then ONE host-keyed agg — count, distinct-base, max-depth,
    * loop-count all partial-aggregate; a pathological host is exactly
    * what AQE skew splitting handles, and the [[apportionBudget]] /
    * [[politenessSlots]] levers consume this report's flags.
    */
  def trapReport(urls: DataFrame, urlCol: String,
      fanoutPpm: Long = 5000000L, loopRepeats: Int = 2): DataFrame = {
    import graft.functions.Urls
    require(fanoutPpm >= 1000000L && loopRepeats >= 1)
    val u = urls.select(col(urlCol).as("url")).distinct()
      .select(col("url"), Urls.host(col("url")).as("host"),
        regexp_replace(col("url"), "\\?.*$", "").as("base"),
        filter(split(Urls.path(col("url")), "/"), s => s =!= "")
          .as("segs"))
      .withColumn("depth", size(col("segs")).cast("long"))
      .withColumn("loopy",
        size(col("segs")) - size(array_distinct(col("segs")))
          >= loopRepeats)
    u.groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("base")).as("n_base"),
        max(col("depth")).as("max_depth"),
        sum(when(col("loopy"), 1L).otherwise(0L)).as("n_loopy"))
      .withColumn("fanout_ppm", expr("n_urls * 1000000L div n_base"))
      .withColumn("is_trap",
        col("fanout_ppm") >= fanoutPpm || col("n_loopy") > 0)
  }

  /** Recrawl scheduling from observed change rates (the Cho &
    * Garcia-Molina freshness-maximization shape, integerized): per
    * URL, consecutive visit fingerprints compare via a lag window;
    * per host, the changed-share in ppm buckets into a revisit tier
    * (`thresholds` = (minPpm, tierName) pairs, highest match wins,
    * `defaultBucket` below all). The sitemap-lastmod path (q368) is
    * the PUSH signal; this is the PULL estimate for hosts that
    * publish nothing.
    *
    * Scale: the lag window is URL-partitioned (visits per URL =
    * epochs, bounded), the rollup host-keyed — both partial-agg
    * friendly, no data-sized window.
    */
  def changeRateSchedule(visits: DataFrame, urlCol: String,
      hostCol: String, epochCol: String, fpCol: String,
      thresholds: Seq[(Long, String)],
      defaultBucket: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholds.nonEmpty)
    val w = Window.partitionBy(col(urlCol)).orderBy(col(epochCol))
    val ch = visits
      .withColumn("__prev", lag(col(fpCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__chg",
        when(col(fpCol) =!= col("__prev"), 1L).otherwise(0L))
    val sorted = thresholds.sortBy(-_._1)
    val bucket = sorted.tail
      .foldLeft(when(col("change_ppm") >= sorted.head._1,
        lit(sorted.head._2))) { case (acc, (t, nm)) =>
        acc.when(col("change_ppm") >= t, lit(nm))
      }
      .otherwise(lit(defaultBucket))
    ch.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_obs"), sum(col("__chg")).as("n_changed"))
      .withColumn("change_ppm", expr("n_changed * 1000000L div n_obs"))
      .withColumn("revisit", bucket)
  }

  def politenessSlots(urls: DataFrame, perHostPerSlot: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(perHostPerSlot >= 1,
      s"perHostPerSlot must be >= 1, got $perHostPerSlot")
    urls.withColumn("fetch_seq",
        row_number().over(
          Window.partitionBy(col("host")).orderBy(col("url")))
          .cast("long") - 1)
      .withColumn("fetch_slot", expr(s"fetch_seq div $perHostPerSlot"))
  }
}
