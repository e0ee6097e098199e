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

  /** The central edge document (`getEnterpriseEdges`,
    * FIXTURES.md §2) — the subset the gold pipeline consumes.
    */
  val edgeDoc: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("logicalId", StringType),
    StructField("enterpriseId", StringType),
    StructField("name", StringType),
    StructField("edgeState", StringType),
    StructField("activationTime", StringType),
    StructField("lastContact", StringType),
    StructField("created", StringType),
    StructField("buildNumber", StringType),
    StructField("modelNumber", StringType),
    StructField("serialNumber", StringType),
    StructField("haState", StringType),
    StructField("site", site),
    StructField("recentLinks", ArrayType(recentLink)),
    StructField("licenses", ArrayType(license))))
}
