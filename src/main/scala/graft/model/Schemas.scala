package graft.model

import org.apache.spark.sql.types._

/** Declared StructTypes for API payloads (FIXTURES.md §1-§3; SURVEY
  * §1.2). The reference consumes these documents with dict access and
  * KeyError fallbacks; declaring the schema makes every missing key a
  * typed null (`spark.read.json(ds, schema)`), so absence is data, not
  * exception control flow. All fields nullable by design.
  */
object Schemas {

  /** `site` sub-document (`powerbi_main_fun.py:648-651,793-825`). */
  val site: StructType = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("postalCode", StringType),
    StructField("streetAddress", StringType)))

  /** `recentLinks[]` entry (`powerbi_main_fun.py:695-700,1545-1561`). */
  val recentLink: StructType = StructType(Seq(
    StructField("internalId", StringType),
    StructField("displayName", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("ipAddress", StringType),
    StructField("backupState", StringType),
    StructField("networkType", StringType)))

  /** `licenses[]` entry (`powerbi_main_fun.py:1506-1514`). */
  val license: StructType = StructType(Seq(
    StructField("sku", StringType),
    StructField("start", StringType),
    StructField("end", StringType),
    StructField("active", BooleanType),
    StructField("termMonths", IntegerType),
    StructField("edition", StringType),
    StructField("bandwidthTier", StringType)))

  /** QOS rule (`powerbi_main_fun.py:2205-2226`): the edge2Cloud
    * route-action shape consulted by the feature-set scans.
    */
  val qosRule: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("action", StructType(Seq(
      StructField("routeType", StringType),
      StructField("edge2CloudRouteAction", StructType(Seq(
        StructField("routePolicy", StringType),
        StructField("routeCfg", StructType(Seq(
          StructField("type", StringType))))))))))))

  private val namedRule = StructType(Seq(StructField("name", StringType)))

  /** WAN module link entry (`powerbi_main_fun.py:1655-1665`). */
  val wanLink: StructType = StructType(Seq(
    StructField("internalId", StringType),
    StructField("MTU", IntegerType),
    StructField("isp", StringType),
    StructField("discovery", StringType),
    StructField("type", StringType),
    StructField("mode", StringType),
    StructField("vlanId", IntegerType),
    StructField("bwMeasurement", StringType),
    StructField("dynamicBwAdjustmentEnabled", BooleanType)))

  /** One config-stack module (`getEdgeConfigurationStack`,
    * FIXTURES.md §3): the union shape over deviceSettings / QOS /
    * firewall / controlPlane across schema versions 2.0.0 and 3.x —
    * version skew becomes nullable branches (SURVEY §7.4.1).
    */
  val stackModule: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("data", StructType(Seq(
      // QOS 2.x: flat rules; 3.x: per-segment rules
      StructField("rules", ArrayType(qosRule)),
      StructField("segments", ArrayType(StructType(Seq(
        StructField("rules", ArrayType(qosRule)),
        StructField("outbound", ArrayType(namedRule)),
        StructField("vpn", StructType(Seq(
          StructField("enabled", BooleanType),
          StructField("edgeToEdge", BooleanType),
          StructField("edgeToEdgeDetail", StructType(Seq(
            StructField("useCloudGateway", BooleanType))))))))))),
      // firewall 3.x
      StructField("firewall_enabled", BooleanType),
      StructField("stateful_firewall_enabled", BooleanType),
      StructField("inbound", ArrayType(namedRule)),
      // deviceSettings snmp (`powerbi_main_fun.py:2274-2298`)
      StructField("snmp", StructType(Seq(
        StructField("snmpv3", StructType(Seq(
          StructField("enabled", BooleanType))))))),
      // WAN links (`powerbi_main_fun.py:1655-1665`)
      StructField("links", ArrayType(wanLink)),
      // controlPlane 2.x
      StructField("vpn", StructType(Seq(
        StructField("enabled", BooleanType),
        StructField("edgeToEdge", BooleanType),
        StructField("edgeToEdgeDetail", StructType(Seq(
          StructField("useCloudGateway", BooleanType))))))))))))

  /** One config-stack level (index 0 = "Edge Specific Profile",
    * index 1 = profile level).
    */
  val stackLevel: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("schemaVersion", StringType),
    StructField("modules", ArrayType(stackModule))))

  /** Per-edge config-stack document: (edgeId, stack[]). */
  val configStackDoc: StructType = StructType(Seq(
    StructField("edgeId", StringType),
    StructField("stack", ArrayType(stackLevel))))

  /** The central edge document (`getEnterpriseEdges`,
    * FIXTURES.md §2) — the subset the gold pipeline consumes.
    */
  val edgeDoc: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("logicalId", StringType),
    StructField("enterpriseId", StringType),
    StructField("name", StringType),
    StructField("edgeState", StringType),
    StructField("activationState", StringType),
    StructField("activationTime", StringType),
    StructField("lastContact", StringType),
    StructField("created", StringType),
    StructField("buildNumber", StringType),
    StructField("modelNumber", StringType),
    StructField("serialNumber", StringType),
    StructField("haState", StringType),
    StructField("softwareVersion", StringType),
    StructField("site", site),
    StructField("recentLinks", ArrayType(recentLink)),
    StructField("licenses", ArrayType(license)),
    StructField("cloudServices", ArrayType(StructType(Seq(
      StructField("state", StringType),
      StructField("nvs_ip", StringType))))),
    StructField("vnfs", StructType(Seq(
      StructField("securityVnf", StructType(Seq(
        StructField("vms", ArrayType(StructType(Seq(
          StructField("data", StructType(Seq(
            StructField("insertionEnabled", BooleanType),
            StructField("type", StringType),
            StructField("vendor", StringType),
            StructField("vmPowerOff", BooleanType))))))))))))))))

  /** Per-link metrics document (`getEdgeLinkMetrics`,
    * `powerbi_main_fun.py:517-534,1612-1665`).
    */
  val linkMetricDoc: StructType = StructType(Seq(
    StructField("scoreTx", DoubleType),
    StructField("scoreRx", DoubleType),
    StructField("bpsOfBestPathTx", LongType),
    StructField("bpsOfBestPathRx", LongType),
    StructField("bytesTx", LongType),
    StructField("bytesRx", LongType),
    StructField("link", StructType(Seq(
      StructField("edgeId", LongType),
      StructField("internalId", StringType),
      StructField("displayName", StringType),
      StructField("interface", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType),
      StructField("networkSide", StringType),
      StructField("networkType", StringType),
      StructField("ipAddress", StringType),
      StructField("backupState", StringType))))))

  /** Route-table document (`getEnterpriseRouteTable`,
    * `powerbi_main_fun.py:383-428`).
    */
  val routesDoc: StructType = StructType(Seq(
    StructField("enterpriseId", LongType),
    StructField("subnets", ArrayType(StructType(Seq(
      StructField("eligableExits", ArrayType(StructType(Seq(
        StructField("type", StringType))))),
      StructField("preferredExits", ArrayType(StructType(Seq(
        StructField("type", StringType))))),
      StructField("learnedRoute", StructType(Seq(
        StructField("modified", StringType))))))))))

  /** Enterprise configurations (`getEnterpriseConfigurations`,
    * FIXTURES.md §4): hub detection via the edgeHub ref.
    */
  val configurationsDoc: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modules", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("refs", StructType(Seq(
        StructField("deviceSettings:vpn:edgeHub", StructType(Seq(
          StructField("data", StructType(Seq(
            StructField("logicalId", StringType))))))))))))))))
}
