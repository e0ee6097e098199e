package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipelines.GatewayPipeline

/** q58–q59: the §3.2 gateway pipeline under the oracle gate (S15/J5
  * were spec-only) — inventory gold with the reference's CONNECTED
  * filter, 0-defaults and ALLOW constant (`gateway_script.py:101-243`),
  * and the connectedEdgeList → gatewayrelation bridge with its
  * truthy-vceid guard and dedup (`gateway_script.py:304-325`).
  */
object GatewayQueries extends QueryPack {

  private def gateways(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val k = col("s_suppkey")
    // connectedEdgeList from the supplier's lineitems: one element per
    // row, vceid empty every 5th part key (the reference's falsy guard)
    val edgesPerGw = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(collect_list(struct(
        when(col("l_partkey") % 5 =!= 0,
          concat(lit("e"), col("l_orderkey"))).otherwise(lit(""))
          .as("vceid"))).as("connectedEdgeList"))
    Tables.supplier(s, dir)
      .join(edgesPerGw, col("l_suppkey") === k, "left")
      .select(
        when(k % 23 =!= 0, concat(lit("g"), k)).as("logicalId"),
        concat(lit("gw"), k).as("name"),
        when(k % 2 === 0, "CONNECTED").otherwise("DEGRADED")
          .as("gatewayState"),
        concat(lit("5."), k % 4).as("buildNumber"),
        lit("ACTIVATED").as("activationState"),
        concat(lit("2024-0"), k % 9 + 1, lit("-01T00:00:00.000Z"))
          .as("systemUpSince"),
        lit("CERTIFICATE_REQUIRED").as("endpointPkiMode"),
        when(k % 5 =!= 0, (k % 7).cast("int")).as("connectedEdges"),
        struct(
          when(k % 11 =!= 0, (k % 100).cast("double") / 2).as("cpu"),
          (k % 10).cast("double").as("load"),
          when(k % 13 =!= 0, (k % 64).cast("double")).as("memory"))
          .as("utilizationDetail"),
        struct(
          concat(lit("City"), k % 10).as("city"),
          lit(null).cast("string").as("state"),
          concat(lit("Country"), k % 4).as("country"),
          (k % 90).cast("double").as("lat"),
          (k % 180).cast("double").as("lon"),
          lit(null).cast("string").as("postalCode"),
          lit(null).cast("string").as("contactEmail")).as("site"),
        col("connectedEdgeList"))
  }

  def defs: Map[String, Q] = Map(
    "q58_gateway_gold" -> Q(
      (s, dir) => GatewayPipeline.gatewaysGold(gateways(s, dir),
          lit("2024-05-01").cast("date"))
        .select(col("GatewayID").as("gateway_id"),
          col("Date").as("gw_date"), col("GatewayName").as("gateway_name"),
          col("GWVersion").as("gw_version"), col("GWCity").as("gw_city"),
          col("GWCountry").as("gw_country"),
          col("GWconnectededges").as("gw_connected_edges"),
          col("GWCPU").as("gw_cpu"), col("GWMemory").as("gw_memory"),
          col("GWload").as("gw_load"),
          col("GatewayType").as("gateway_type"))
        .orderBy(col("gateway_id")),
      Some("""SELECT 'g' || CAST(s_suppkey AS VARCHAR) AS gateway_id,
        |  DATE '2024-05-01' AS gw_date,
        |  'gw' || CAST(s_suppkey AS VARCHAR) AS gateway_name,
        |  '5.' || CAST(s_suppkey % 4 AS VARCHAR) AS gw_version,
        |  'City' || CAST(s_suppkey % 10 AS VARCHAR) AS gw_city,
        |  'Country' || CAST(s_suppkey % 4 AS VARCHAR) AS gw_country,
        |  CAST(CASE WHEN s_suppkey % 5 = 0 THEN 0
        |            ELSE s_suppkey % 7 END AS INT) AS gw_connected_edges,
        |  CASE WHEN s_suppkey % 11 = 0 THEN 0.0
        |       ELSE CAST(s_suppkey % 100 AS DOUBLE) / 2 END AS gw_cpu,
        |  CASE WHEN s_suppkey % 13 = 0 THEN 0.0
        |       ELSE CAST(s_suppkey % 64 AS DOUBLE) END AS gw_memory,
        |  CAST(s_suppkey % 10 AS DOUBLE) AS gw_load,
        |  'ALLOW' AS gateway_type
        |FROM supplier
        |WHERE s_suppkey % 2 = 0 AND s_suppkey % 23 <> 0
        |ORDER BY gateway_id""".stripMargin)),

    "q59_gateway_relation" -> Q(
      (s, dir) => GatewayPipeline.relationRows(gateways(s, dir),
          lit("2024-05-01").cast("date"))
        .select(col("EdgeID").as("edge_id"),
          col("GatewayID").as("gateway_id"), col("Date").as("gw_date"))
        .orderBy(col("edge_id"), col("gateway_id")),
      Some("""SELECT DISTINCT 'e' || CAST(l_orderkey AS VARCHAR) AS edge_id,
        |  'g' || CAST(l_suppkey AS VARCHAR) AS gateway_id,
        |  DATE '2024-05-01' AS gw_date
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey % 2 = 0 AND s_suppkey % 23 <> 0
        |  AND l_partkey % 5 <> 0
        |ORDER BY edge_id, gateway_id""".stripMargin))
  )
}
