package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipelines.EdgePipeline
import graft.sources.GeoEnrichment

object CountingIpClient {
  val calls = new AtomicInteger(0)
}

/** Top-level so the closure serializes without the suite. */
class FakeIpGeoClient extends GeoEnrichment.IpGeoClient {
  def insights(ip: String): Option[GeoEnrichment.IpGeoResult] = {
    CountingIpClient.calls.incrementAndGet()
    if (ip.startsWith("203."))
      Some(GeoEnrichment.IpGeoResult("Zscaler Inc", "Germany",
        if (ip.endsWith(".7")) null else s"City-$ip"))
    else None
  }
}

/** The S20 IP half end-to-end: cssFields → enrichIp → five EAV rows,
  * with the reference's has_css / first-UP / city-fallback / ''
  * defaults.
  */
class CloudSecuritySpec extends SparkSpec {

  private val fixture = Seq(
    // two services; the FIRST UP one wins (the reference breaks)
    """{"logicalId":"e-1","cloudServices":[
       {"state":"DOWN","nvs_ip":"203.0.113.1"},
       {"state":"UP","nvs_ip":"203.0.113.7"},
       {"state":"UP","nvs_ip":"203.0.113.9"}]}""",
    // present but none UP: has_css still true, ip stays ''
    """{"logicalId":"e-2","cloudServices":[{"state":"BACKUP","nvs_ip":"203.0.113.2"}]}""",
    // absent: has_css false
    """{"logicalId":"e-3"}""",
    // duplicate IP of e-1's winner: must NOT cost a second call
    """{"logicalId":"e-4","cloudServices":[{"state":"UP","nvs_ip":"203.0.113.7"}]}"""
  ).map(_.replaceAll("\n\\s*", ""))

  private def edges = {
    import spark.implicits._
    EdgePipeline.readEdges(spark, fixture.toDS())
  }

  test("cssFields: has_css regardless of state, first-UP ip, '' default") {
    val rows = CloudSecurity.cssFields(edges)
      .orderBy("EdgeID").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      ("e-1", true, "203.0.113.7"),
      ("e-2", true, ""),
      ("e-3", false, ""),
      ("e-4", true, "203.0.113.7")))
  }

  test("enrichIp resolves distinct IPs once; city falls back to country") {
    CountingIpClient.calls.set(0)
    val enriched = GeoEnrichment.enrichIp(
      CloudSecurity.cssFields(edges), "css_ip",
      () => new FakeIpGeoClient, maxCallsPerSecond = 1000)
    val attrs = CloudSecurity.cssAttributes(enriched)
      .filter(col("name").isin("css_city", "css_organization"))
      .orderBy("uuid", "name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(4)))
    assert(attrs.toSeq === Seq(
      ("e-1", "css_city", "Germany"), // null city → country fallback
      ("e-1", "css_organization", "Zscaler Inc"),
      ("e-2", "css_city", ""), // unresolved ('' ip filtered) → default
      ("e-2", "css_organization", ""),
      ("e-3", "css_city", ""),
      ("e-3", "css_organization", ""),
      ("e-4", "css_city", "Germany"),
      ("e-4", "css_organization", "Zscaler Inc")))
    // e-1 and e-4 share the IP: ONE distinct value, ONE call
    assert(CountingIpClient.calls.get() === 1)
    // used flag rides has_css on every attribute (filter_val encodes it)
    val fv = CloudSecurity.cssAttributes(enriched)
      .filter(col("uuid") === "e-3" && col("name") === "css_ip")
      .select(col("filter_val")).head.getString(0)
    assert(fv === "css_ip-False")
  }
}
