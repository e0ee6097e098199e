package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas

class LinksRoutesSpec extends SparkSpec {

  private def stacks = {
    import spark.implicits._
    spark.read.schema(Schemas.configStackDoc).json(Seq(
      """{"edgeId":"e-1","stack":[
        |{"name":"Edge Specific Profile","schemaVersion":"3.0.0","modules":[
        |  {"name":"WAN","data":{"links":[
        |    {"internalId":"l-1","MTU":1500,"isp":"Comcast","discovery":"AUTO","type":"WIRED","mode":"Public","vlanId":0},
        |    {"internalId":"l-2","MTU":1400,"isp":"ignored","discovery":"USER","type":"WIRED","mode":"Private","vlanId":7}]}}]},
        |{"name":"Prof","schemaVersion":"3.0.0","modules":[]}]}"""
        .stripMargin.replaceAll("\n", "")
    ).toDS())
  }

  private def metrics = {
    import spark.implicits._
    spark.read.schema(Schemas.linkMetricDoc).json(Seq(
      """{"scoreTx":4.0,"scoreRx":4.0,"link":{"edgeId":1,"internalId":"l-1","displayName":"wan1","interface":"GE1","lat":1.0,"lon":2.0,"networkSide":"WAN","networkType":"ETHERNET","ipAddress":"10.0.0.1","backupState":"UNCONFIGURED"}}""",
      """{"link":{"edgeId":1,"internalId":"l-2","interface":"GE2","lat":3.0,"lon":4.0,"networkSide":"WAN","networkType":"ETHERNET","backupState":"UNCONFIGURED"}}""",
      """{"link":{"edgeId":1,"internalId":"l-3","displayName":"lte","interface":"CELL1","lat":5.0,"lon":6.0,"networkSide":"WAN","networkType":"WIRELESS","backupState":"ACTIVE"}}"""
    ).toDS()).withColumn("edge_id", lit("e-1"))
  }

  test("J1 enrichment: WAN decoration, MPLS override, Not set defaults") {
    val wan = Links.wanLinks(stacks, "edgeId")
    val got = Links.enrichLinkMetrics(metrics, "edge_id", wan, "edgeId")
      .select("LinkUUID", "LinkName", "ISP", "MTU", "LinkMode", "VLANID", "LinkID")
      .orderBy("LinkUUID").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
    assert(got.toSeq === Seq(
      ("l-1", "wan1", "Comcast", "1500", "Public", "0", "e-1-l-1"),
      // Private mode overrides ISP to MPLS
      ("l-2", "Not set", "MPLS", "1400", "Private", "7", "e-1-l-2"),
      // no WAN config match: all decoration defaults
      ("l-3", "lte", "Not set", "Not set", "Not set", "Not set", "e-1-l-3")))
  }

  test("overlay link row carries the reference constants") {
    import spark.implicits._
    val got = Links.overlayLinkRows(Seq("e-9").toDF("id"), "id").collect().head
    assert(got.getAs[String]("LinkUUID") === "e-9-OVERLAY")
    assert(got.getAs[String]("LinkID") === "e-9-e-9-OVERLAY")
    assert(got.getAs[String]("ISP") === "VeloCloud")
    assert(got.getAs[String]("Interface") === "null0")
    assert(got.getAs[String]("OverlayType") === "OVERLAY_DEFINED")
  }

  test("matched link with null config field keeps null (not 'Not set')") {
    import spark.implicits._
    val stacksNullIsp = spark.read.schema(Schemas.configStackDoc).json(Seq(
      """{"edgeId":"e-1","stack":[
        |{"name":"Edge Specific Profile","schemaVersion":"3.0.0","modules":[
        |  {"name":"WAN","data":{"links":[
        |    {"internalId":"l-1","MTU":1500,"mode":"Public","vlanId":0}]}}]}]}"""
        .stripMargin.replaceAll("\n", "")).toDS())
    val wan = Links.wanLinks(stacksNullIsp, "edgeId")
    val row = Links.enrichLinkMetrics(
        metrics.filter(col("link.internalId") === "l-1"), "edge_id", wan, "edgeId")
      .collect().head
    // matched: isp/discovery/type are null in config → stay null
    assert(row.getAs[String]("ISP") === null)
    assert(row.getAs[String]("OverlayType") === null)
    assert(row.getAs[String]("MTU") === "1500")
  }

  test("WAN join is scoped per edge (same internalId under two edges)") {
    import spark.implicits._
    val twoEdges = spark.read.schema(Schemas.configStackDoc).json(Seq(
      """{"edgeId":"e-1","stack":[{"name":"Edge Specific Profile","schemaVersion":"3.0.0","modules":[
        |{"name":"WAN","data":{"links":[{"internalId":"l-1","isp":"ISP-A","mode":"Public"}]}}]}]}""",
      """{"edgeId":"e-2","stack":[{"name":"Edge Specific Profile","schemaVersion":"3.0.0","modules":[
        |{"name":"WAN","data":{"links":[{"internalId":"l-1","isp":"ISP-B","mode":"Public"}]}}]}]}"""
    ).map(_.stripMargin.replaceAll("\n", "")).toDS())
    val wan = Links.wanLinks(twoEdges, "edgeId")
    val rows = Links.enrichLinkMetrics(
        metrics.filter(col("link.internalId") === "l-1"), "edge_id", wan, "edgeId")
      .collect()
    assert(rows.length === 1) // no cross-edge fan-out
    assert(rows.head.getAs[String]("ISP") === "ISP-A") // e-1's config only
  }

  test("A7 route aggregates: non-DIRECT preferred exits + 24h change window") {
    import spark.implicits._
    val doc =
      """{"enterpriseId":1,"subnets":[
        |{"preferredExits":[{"type":"DIRECT"},{"type":"GATEWAY"},{"type":"HUB"}],
        | "eligableExits":[{"type":"GATEWAY"}],
        | "learnedRoute":{"modified":"2024-01-01T06:00:00.000Z"}},
        |{"preferredExits":[{"type":"DIRECT"}],
        | "learnedRoute":{"modified":"2023-12-25T00:00:00.000Z"}},
        |{"preferredExits":[{"type":"GATEWAY"}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val routes = spark.read.schema(Schemas.routesDoc).json(Seq(doc).toDS())
    val now = lit("2024-01-01 12:00:00").cast("timestamp")
    val got = routes.select(
        Routes.routeNum(col("subnets")).as("n"),
        Routes.routeChange(col("subnets"), now).as("c"))
      .collect().head
    // GATEWAY+HUB from subnet 1, GATEWAY from subnet 3 → 3
    assert(got.getInt(0) === 3)
    // only subnet 1's learnedRoute is within 24h; subnet 3 has none
    assert(got.getInt(1) === 1)
  }
}
