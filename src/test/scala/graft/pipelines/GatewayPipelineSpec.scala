package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GatewayPipelineSpec extends SparkSpec {

  private def gws = {
    import spark.implicits._
    GatewayPipeline.readGateways(spark, Seq(
      """{"id":1,"logicalId":"gw-1","name":"vcg1","gatewayState":"CONNECTED",
        |"buildNumber":"4.2","activationState":"ACTIVATED","systemUpSince":"2024-01-01",
        |"endpointPkiMode":"CERTIFICATE_DISABLED","connectedEdges":2,
        |"utilizationDetail":{"cpu":12.5,"load":null,"memory":55.0},
        |"site":{"city":"SJC","country":"US","lat":37.0,"lon":-121.0},
        |"connectedEdgeList":[{"vceid":"e-1"},{"vceid":"e-2"},{"vceid":null},{"vceid":"e-1"}]}"""
        .stripMargin.replaceAll("\n", ""),
      """{"id":2,"logicalId":"gw-2","name":"vcg2","gatewayState":"OFFLINE"}"""
    ).toDS())
  }

  test("gatewaysGold: CONNECTED only, 0-defaults, ALLOW constant") {
    val rows = GatewayPipeline.gatewaysGold(gws, lit("2024-08-12 00:00:00"))
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("GatewayID") === "gw-1")
    assert(r.getAs[Double]("GWload") === 0.0)   // null → 0
    assert(r.getAs[Double]("GWCPU") === 12.5)
    assert(r.getAs[Int]("GWconnectededges") === 2)
    assert(r.getAs[String]("GatewayType") === "ALLOW")
  }

  test("mergeMetrics: maxima override inventory, failed call zeroes counts") {
    import spark.implicits._
    val gold = GatewayPipeline.gatewaysGold(gws, lit("2024-08-12 00:00:00"))
    val metrics = Seq(("gw-1", 88.0, 61.0, 120L, 3L, 42L))
      .toDF("gatewayId", "cpuPct_max", "memoryPct_max", "flowCount_max",
        "handoffQueueDrops_max", "tunnelCount_max")
    val merged = GatewayPipeline.mergeMetrics(gold, metrics).collect().head
    assert(merged.getAs[Double]("GWCPU") === 88.0)   // overridden
    assert(merged.getAs[Double]("GWMemory") === 61.0)
    assert(merged.getAs[Long]("gw_tunnel") === 42L)

    val noMetrics = GatewayPipeline.mergeMetrics(gold,
        metrics.filter(lit(false))).collect().head
    assert(noMetrics.getAs[Double]("GWCPU") === 12.5) // inventory value kept
    assert(noMetrics.getAs[Long]("gw_flow_count") === 0L)
  }

  test("relationRows: explode, truthy vceid filter, unique bridge key") {
    val rows = GatewayPipeline.relationRows(gws, lit("2024-08-12 00:00:00"))
      .orderBy("EdgeID").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("e-1", "gw-1"), ("e-2", "gw-1")))
  }
}
