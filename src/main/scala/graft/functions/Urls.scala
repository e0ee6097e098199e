package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus deduplication — the
  * normalize-before-fingerprint step every crawl pipeline applies so
  * `HTTP://WWW.X.COM:80/p/?utm_source=a#f` and `http://x.com/p`
  * collapse to one key. Pure column expressions (scan-speed, no UDF);
  * all patterns are ASCII-only so Java regex and RE2-family engines
  * agree (the QualityFilters.scrubPii discipline).
  *
  * Rules: scheme and host lowercase; `www.` prefix stripped; `:80` /
  * `:443` ports dropped; fragment dropped; `utm_*` tracking params
  * removed (param order otherwise preserved, empty query dropped);
  * trailing path slashes trimmed. Path/query case is preserved — only
  * the case-insensitive components fold.
  */
object Urls {

  private val schemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  def host(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val hostPort = regexp_extract(noFrag, schemePat + "([^/?#]*)", 2)
    regexp_replace(
      regexp_replace(lower(hostPort), ":(80|443)$", ""),
      "^www\\.", "")
  }

  /** Path component (leading-slash form, query/fragment excluded) —
    * the robots.txt match subject. Empty for a bare-host URL.
    */
  def path(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    regexp_extract(noFrag, schemePat + "[^/?#]*([^?#]*)", 2)
  }

  /** Last two dot-labels of an already-[[host]]-normalized hostname —
    * the eTLD+1 approximation that groups `crawl1.site3.com` and
    * `cdn.site3.com` under `site3.com`. A production crawl pipeline
    * substitutes a Public Suffix List lookup here (a broadcast map
    * join); the Spark shape — a pure column expression riding the
    * scan — is identical.
    */
  def registrableDomain(host: Column): Column =
    when(host === "", lit("")).otherwise(substring_index(host, ".", -2))

  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, schemePat, 1))
    val rest = regexp_extract(noFrag, schemePat + "[^/?#]*(.*)$", 2)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p === ""))
    val queryNorm = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host(url), path, queryNorm)
  }
}
