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

  /** gatewayrelation bridge (J5, `gateway_script.py:304-325`): one
    * (EdgeID, GatewayID, Date) row per connectedEdgeList element with
    * a truthy vceid.
    */
  def relationRows(gws: DataFrame, date: Column): DataFrame =
    gws
      .filter(col("gatewayState") === "CONNECTED")
      .select(col("logicalId").as("GatewayID"),
        explode(col("connectedEdgeList")).as("e"))
      .select(col("e").getField("vceid").as("EdgeID"), col("GatewayID"),
        date.as("Date"))
      .filter(col("EdgeID").isNotNull && col("EdgeID") =!= "")
      .dropDuplicates("EdgeID", "GatewayID")
}
