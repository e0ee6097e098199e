package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas

/** Golden tests for the config-stack traversals, hand-traced through
  * the reference loops (`process_segment_pb`, `process_nonsegment_pb`,
  * `process_fw`, `update_segment_firewall`, the b2b scan) on fixtures
  * covering BOTH schema versions — the FIXTURES.md §3 variant matrix.
  */
class ConfigStackSpec extends SparkSpec {

  private def rule(policy: String, cfgType: String = null) = {
    val cfg = if (cfgType == null) "{}" else s"""{"type":"$cfgType"}"""
    s"""{"action":{"routeType":"edge2Cloud","edge2CloudRouteAction":{"routePolicy":"$policy","routeCfg":$cfg}}}"""
  }

  private val seg3x =
    s"""{"edgeId":"e-1","stack":[
       |{"name":"Edge Specific Profile","schemaVersion":"3.4.0","modules":[
       |  {"name":"QOS","data":{"segments":[
       |    {"rules":[${rule("gateway")},${rule("other", "dataCenter")}]},
       |    {"rules":[${rule("direct")}]}]}},
       |  {"name":"firewall","data":{"firewall_enabled":true,
       |    "inbound":[{"name":"i1"},{"name":"i2"}],
       |    "segments":[{"outbound":[{"name":"o1"}]},{"outbound":[]}]}},
       |  {"name":"controlPlane","data":{"segments":[
       |    {"vpn":{"enabled":true,"edgeToEdge":true,
       |            "edgeToEdgeDetail":{"useCloudGateway":false}}}]}}]},
       |{"name":"ProfileX","schemaVersion":"3.4.0","modules":[
       |  {"name":"QOS","data":{"segments":[{"rules":[${rule("other", "cloudSecurityService")}]}]}},
       |  {"name":"firewall","data":{"stateful_firewall_enabled":true,"inbound":[]}}]}
       |]}""".stripMargin.replaceAll("\n", "")

  private val nonseg2x =
    s"""{"edgeId":"e-2","stack":[
       |{"name":"Edge Specific Profile","schemaVersion":"2.0.0","modules":[
       |  {"name":"QOS","data":{"rules":[${rule("direct")}]}},
       |  {"name":"controlPlane","data":{"vpn":{"edgeToEdge":true,
       |    "edgeToEdgeDetail":{"useCloudGateway":true}}}}]},
       |{"name":"Prof","schemaVersion":"2.0.0","modules":[
       |  {"name":"QOS","data":{"rules":[${rule("other", "cloudSecurityService")}]}}]}
       |]}""".stripMargin.replaceAll("\n", "")

  private def docs = {
    import spark.implicits._
    spark.read.schema(Schemas.configStackDoc).json(Seq(seg3x, nonseg2x).toDS())
  }

  test("isSegmented branches on stack[0].schemaVersion") {
    val got = docs.select(col("edgeId"),
        ConfigStack.isSegmented(col("stack")).as("seg"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("e-1" -> true, "e-2" -> false))
  }

  test("3.x pb flags: segment-0-only rules, elif order, edge level wins") {
    val f = docs.filter(col("edgeId") === "e-1")
      .select(ConfigStack.pbFlagsWithFallback(col("stack"), segmented = true)
        .as("f"))
      .select("f.*").collect().head
    // gateway rule → pb_via_gw; 'other'+dataCenter → nvs (elif reaches
    // routeCfg only past gateway/direct); segment 1's direct rule is
    // ignored (segment 0 only); profile css never consulted (edge has
    // pb_via_gw).
    assert((f.getBoolean(0), f.getBoolean(1), f.getBoolean(2),
      f.getBoolean(3), f.getBoolean(4)) === ((true, false, false, false, true)))
  }

  test("2.x pb flags: value-based fallback replaces ALL five flags") {
    val f = docs.filter(col("edgeId") === "e-2")
      .select(ConfigStack.pbFlagsWithFallback(col("stack"), segmented = false)
        .as("f"))
      .select("f.*").collect().head
    // Edge level has only pb_internet_via_direct=true — but the
    // fallback triggers on pb/css/nvs all-false and replaces the WHOLE
    // tuple with profile level (css only): direct is discarded, as in
    // the reference.
    assert((f.getBoolean(0), f.getBoolean(1), f.getBoolean(2),
      f.getBoolean(3), f.getBoolean(4)) === ((false, false, false, true, false)))
  }

  test("segment firewall attrs: null-coalesced levels, OR'd bools, summed counts") {
    val f = docs.filter(col("edgeId") === "e-1")
      .select(ConfigStack.segmentFirewallAttrs(col("stack")).as("f"))
      .select("f.*").collect().head
    assert(f.getBoolean(0) === true)   // enabled: edge level
    assert(f.getBoolean(1) === true)   // in_bool: edge inbound x2
    assert(f.getBoolean(2) === true)   // out_bool: edge segment outbound
    assert(f.getInt(3) === 3)          // 1 outbound + 2 inbound + 0 profile
    assert(f.getBoolean(4) === true)   // stateful: PROFILE level fallback
  }

  test("featureSetFromStack: version branch + elif chain end-to-end") {
    val got = docs.select(col("edgeId"),
        ConfigStack.featureSetFromStack(col("stack")).as("f"))
      .select(col("edgeId"), col("f.b2b_via_hub"), col("f.pb_via_gw"),
        col("f.css_via_gw"), col("f.feature_set"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getString(4)))).toMap
    // e-1 (3.x): b2b via hub (not gw) + pb_via_gw true → Premium
    assert(got("e-1") === ((true, true, false, "Premium Subscription")))
    // e-2 (2.0.0): b2b via GW → Premium even though pb fell back to css
    assert(got("e-2")._4 === "Premium Subscription")
    assert(got("e-2")._3 === true) // css from the profile-level fallback
  }

  test("b2b flags: 3.x segments[0].vpn vs 2.x flat vpn, gw/hub split") {
    val got = docs.select(col("edgeId"),
        ConfigStack.b2bFlags(col("stack"), segmented = true).as("s3"),
        ConfigStack.b2bFlags(col("stack"), segmented = false).as("s2"))
      .collect().map(r => r.getString(0) ->
        ((r.getStruct(1).getBoolean(0), r.getStruct(1).getBoolean(1),
          r.getStruct(2).getBoolean(0), r.getStruct(2).getBoolean(1)))).toMap
    // e-1 (3.x form): enabled && edgeToEdge, useCloudGateway=false → hub
    assert((got("e-1")._1, got("e-1")._2) === ((false, true)))
    // e-2 (2.x form): edgeToEdge && useCloudGateway=true → gw
    assert((got("e-2")._3, got("e-2")._4) === ((true, false)))
  }
}
