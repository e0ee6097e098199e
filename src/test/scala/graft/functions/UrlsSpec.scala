package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization rules one by one, plus idempotence (q108
  * gates the full normalizer against a closed-form oracle that never
  * runs these regexes).
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.normalize(col("u"))).as[String].collect().toSeq

  test("scheme and host fold to lowercase; path case is preserved") {
    assert(norm("HTTPS://ExAmple.COM/CaseD/Path") ==
      Seq("https://example.com/CaseD/Path"))
  }

  test("www prefix and default ports are stripped") {
    assert(norm(
      "http://www.site.com:80/a",
      "https://www.site.com:443/a",
      "http://site.com:8080/a") ==
      Seq("http://site.com/a", "https://site.com/a",
        "http://site.com:8080/a"))
  }

  test("fragment drops; trailing slashes trim; utm params vanish") {
    assert(norm(
      "http://x.com/a/#sec",
      "http://x.com/a///",
      "http://x.com/a?utm_source=m&id=7&utm_campaign=c",
      "http://x.com/a?utm_source=m") ==
      Seq("http://x.com/a", "http://x.com/a",
        "http://x.com/a?id=7", "http://x.com/a"))
  }

  test("host extraction survives ports, paths, and queries") {
    val hosts = Seq(
      "http://WWW.A.com:80/x?q=1",
      "https://b.org#f").toDF("u")
      .select(Urls.host(col("u"))).as[String].collect().toSeq
    assert(hosts == Seq("a.com", "b.org"))
  }

  test("normalize is idempotent") {
    val messy = Seq(
      "HTTP://WWW.Site3.COM:80/Path/2/?utm_source=mail&id=9#frag",
      "https://x.com/", "http://y.net/p?a=1&b=2")
    val once = norm(messy: _*)
    assert(norm(once: _*) == once)
  }

  test("registrableDomain keeps the last two labels") {
    val doms = Seq("crawl1.site3.com", "a.b.c.example.org", "x.com",
        "localhost", "")
      .toDF("h").select(Urls.registrableDomain(col("h")))
      .as[String].collect().toSeq
    assert(doms == Seq("site3.com", "example.org", "x.com",
      "localhost", ""))
  }
}
