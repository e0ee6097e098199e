package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Schemas

class HubsSpec extends SparkSpec {

  private def configs = {
    import spark.implicits._
    spark.read.schema(Schemas.configurationsDoc).json(Seq(
      """{"id":1,"modules":[
        |{"name":"deviceSettings","refs":{"deviceSettings:vpn:edgeHub":{"data":{"logicalId":"e-hub-1"}}}},
        |{"name":"QOS"}]}""".stripMargin.replaceAll("\n", ""),
      """{"id":2,"modules":[
        |{"name":"deviceSettings","refs":{}}]}""".stripMargin.replaceAll("\n", ""),
      """{"id":3,"modules":[
        |{"name":"deviceSettings","refs":{"deviceSettings:vpn:edgeHub":{"data":{"logicalId":"e-hub-1"}}}}]}"""
        .stripMargin.replaceAll("\n", "")
    ).toDS())
  }

  test("hubIds derives the distinct edgeHub ref set") {
    val ids = Hubs.hubIds(configs).collect().map(_.getString(0))
    assert(ids.toSeq === Seq("e-hub-1"))
  }

  test("flagHubs marks members via broadcast join") {
    import spark.implicits._
    val edges = Seq("e-hub-1", "e-plain").toDF("logicalId")
    val got = Hubs.flagHubs(edges, Hubs.hubIds(configs), "logicalId")
      .orderBy("logicalId").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    assert(got.toSeq === Seq(("e-hub-1", true), ("e-plain", false)))
  }

  test("vnfAttrs traverses vms[0].data; absent vnfs → defaults") {
    import spark.implicits._
    val edges = spark.read.schema(Schemas.edgeDoc).json(Seq(
      """{"logicalId":"e-1","vnfs":{"securityVnf":{"vms":[{"data":
        |{"insertionEnabled":true,"type":"firewall","vendor":"vmw","vmPowerOff":false}}]}}}"""
        .stripMargin.replaceAll("\n", ""),
      """{"logicalId":"e-2","vnfs":{"securityVnf":{"vms":[{"data":
        |{"insertionEnabled":false,"type":"x","vendor":"y","vmPowerOff":true}}]}}}"""
        .stripMargin.replaceAll("\n", ""),
      """{"logicalId":"e-3"}"""
    ).toDS())
    val got = edges.select(col("logicalId"),
        Hubs.vnfAttrs(col("vnfs")).as("v")).select("logicalId", "v.*")
      .orderBy("logicalId").collect()
      .map(r => (r.getString(0), r.getBoolean(1), Option(r.getString(2)),
        Option(r.getString(3)), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("e-1", true, Some("firewall"), Some("vmw"), true),
      ("e-2", false, None, None, false),
      ("e-3", false, None, None, false)))
  }

  test("snmpv3: edge-specific snmp key wins; key-presence fallback to profile") {
    import spark.implicits._
    val mk = (edge: String, prof: String) =>
      s"""{"edgeId":"x","stack":[
         |{"name":"Edge Specific Profile","schemaVersion":"3.0.0","modules":[$edge]},
         |{"name":"Prof","schemaVersion":"3.0.0","modules":[$prof]}]}"""
        .stripMargin.replaceAll("\n", "")
    val dsWith = (en: String) =>
      s"""{"name":"deviceSettings","data":{"snmp":{"snmpv3":{"enabled":$en}}}}"""
    val dsNoSnmp = """{"name":"deviceSettings","data":{}}"""
    val docs = spark.read.schema(Schemas.configStackDoc).json(Seq(
      mk(dsWith("true"), dsWith("false")),   // edge key present true
      mk(dsWith("false"), dsWith("true")),   // edge key present false → stays false
      mk(dsNoSnmp, dsWith("true")),          // fallback to profile
      mk(dsNoSnmp, dsNoSnmp)                 // nobody has snmp
    ).toDS())
    val got = docs.select(ConfigStack.snmpv3Enabled(col("stack")))
      .collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, false, true, false))
  }

  test("cssAttrs: any-entry has_css, first-UP ip, break semantics") {
    import spark.implicits._
    val edges = spark.read.schema(Schemas.edgeDoc).json(Seq(
      // two UP entries: the FIRST one's ip wins (loop break)
      """{"logicalId":"e-1","cloudServices":[
        |{"state":"DOWN","nvs_ip":"1.1.1.1"},
        |{"state":"UP","nvs_ip":"2.2.2.2"},
        |{"state":"UP","nvs_ip":"3.3.3.3"}]}""".stripMargin.replaceAll("\n", ""),
      // present but never UP: has_css true, ip empty
      """{"logicalId":"e-2","cloudServices":[{"state":"BACKUP","nvs_ip":"4.4.4.4"}]}""",
      // absent: all defaults
      """{"logicalId":"e-3"}"""
    ).toDS())
    val got = edges.select(col("logicalId"),
        Hubs.cssAttrs(col("cloudServices")).as("c")).select("logicalId", "c.*")
      .orderBy("logicalId").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("e-1", true, "2.2.2.2"), ("e-2", true, ""), ("e-3", false, "")))
  }

  test("softwareVersion: empty string normalizes to null") {
    import spark.implicits._
    val got = Seq(Some("4.5.0"), Some(""), None).toDF("v")
      .select(Hubs.softwareVersion(col("v"))).collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("4.5.0"), None, None))
  }

  test("lastBy returns the value at the max order") {
    import spark.implicits._
    val df = Seq((1, 10L, "v1"), (1, 30L, "v3"), (1, 20L, "v2"))
      .toDF("k", "ord", "v")
    val got = df.groupBy("k")
      .agg(Aggregates.lastBy(col("v"), col("ord")).as("last_v"))
      .collect().head.getString(1)
    assert(got === "v3")
  }
}
