package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §3.2 gateway pipeline (`gateway_script.py:88-327`): gateway
  * inventory → Gateways gold + gatewayrelation bridge.
  *
  * Reference quirks, documented rather than silently fixed:
  *  - `GatewayType` is computed by an if/else and then UNCONDITIONALLY
  *    overwritten with "ALLOW" (`gateway_script.py:239-243`) — the
  *    constant is reproduced;
  *  - the reference upsert sets `GWMemory = VALUES(GWuptime)` on
  *    update (`:292`) — a sink-side bug we do NOT reproduce (our merge
  *    maps columns by name).
  */
object GatewayPipeline {

  val gatewayDoc: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("logicalId", StringType),
    StructField("name", StringType),
    StructField("gatewayState", StringType),
    StructField("buildNumber", StringType),
    StructField("activationTime", StringType),
    StructField("activationState", StringType),
    StructField("systemUpSince", StringType),
    StructField("endpointPkiMode", StringType),
    StructField("connectedEdges", IntegerType),
    StructField("utilizationDetail", StructType(Seq(
      StructField("cpu", DoubleType),
      StructField("load", DoubleType),
      StructField("memory", DoubleType)))),
    StructField("site", StructType(Seq(
      StructField("city", StringType),
      StructField("state", StringType),
      StructField("country", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType),
      StructField("postalCode", StringType),
      StructField("contactEmail", StringType)))),
    StructField("connectedEdgeList", ArrayType(StructType(Seq(
      StructField("vceid", StringType)))))))

  def readGateways(spark: SparkSession, jsonLines: Dataset[String]): DataFrame =
    spark.read.schema(gatewayDoc).json(jsonLines)

  /** Gateways gold rows: CONNECTED gateways only (`:104`), 0-defaults
    * for null utilization/connectedEdges (`:221-237`), the ALLOW
    * GatewayType constant, daily date grain.
    */
  def gatewaysGold(gws: DataFrame, date: Column): DataFrame =
    gws
      .filter(col("gatewayState") === "CONNECTED")
      .filter(col("logicalId").isNotNull)
      .select(
        date.as("Date"),
        col("logicalId").as("GatewayID"),
        col("name").as("GatewayName"),
        col("buildNumber").as("GWVersion"),
        col("site").getField("city").as("GWCity"),
        col("site").getField("country").as("GWCountry"),
        col("site").getField("lat").as("GWLAT"),
        col("site").getField("lon").as("GWLON"),
        col("activationState").as("GWActivationState"),
        col("gatewayState").as("GWCurrentstatus"),
        col("systemUpSince").as("GWuptime"),
        coalesce(col("connectedEdges"), lit(0)).as("GWconnectededges"),
        coalesce(col("utilizationDetail").getField("cpu"), lit(0.0d)).as("GWCPU"),
        coalesce(col("utilizationDetail").getField("memory"), lit(0.0d)).as("GWMemory"),
        coalesce(col("utilizationDetail").getField("load"), lit(0.0d)).as("GWload"),
        col("endpointPkiMode").as("GWpki"),
        lit("ALLOW").as("GatewayType"))

  /** A18: merge the 24 h max-metrics (`getGatewayStatusMetrics`
    * returns server-side maxima, `gateway_script.py:250-262`) over the
    * inventory row. The reference OVERWRITES GWCPU/GWMemory with the
    * metric maxima when the call succeeds and zeroes the three counts
    * when it fails — restated as a left join with coalesce (missing
    * metrics row = failed call).
    */
  def mergeMetrics(gold: DataFrame, metrics: DataFrame): DataFrame =
    gold
      .join(metrics.select(
          col("gatewayId").as("GatewayID"),
          col("cpuPct_max"), col("memoryPct_max"),
          col("flowCount_max"), col("handoffQueueDrops_max"),
          col("tunnelCount_max")),
        Seq("GatewayID"), "left")
      .withColumn("GWCPU", coalesce(col("cpuPct_max"), col("GWCPU")))
      .withColumn("GWMemory", coalesce(col("memoryPct_max"), col("GWMemory")))
      .withColumn("gw_flow_count", coalesce(col("flowCount_max"), lit(0L)))
      .withColumn("gw_handoff", coalesce(col("handoffQueueDrops_max"), lit(0L)))
      .withColumn("gw_tunnel", coalesce(col("tunnelCount_max"), lit(0L)))
      .drop("cpuPct_max", "memoryPct_max", "flowCount_max",
        "handoffQueueDrops_max", "tunnelCount_max")

  /** gatewayrelation bridge (J5, `gateway_script.py:304-325`): one
    * (EdgeID, GatewayID, Date) row per connectedEdgeList element with
    * a truthy vceid.
    */
  def relationRows(gws: DataFrame, date: Column): DataFrame =
    gws
      .filter(col("gatewayState") === "CONNECTED")
      .filter(col("logicalId").isNotNull) // same guard as gatewaysGold —
      // a null GatewayID never matches a MERGE ON clause and would
      // re-insert on every replay
      .select(col("logicalId").as("GatewayID"),
        explode(col("connectedEdgeList")).as("e"))
      .select(col("e").getField("vceid").as("EdgeID"), col("GatewayID"),
        date.as("Date"))
      .filter(col("EdgeID").isNotNull && col("EdgeID") =!= "")
      .dropDuplicates("EdgeID", "GatewayID")
}
