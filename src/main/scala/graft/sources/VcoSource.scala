package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model.Schemas

/** S1–S17: the JSON-RPC API source layer, restated Spark-first.
  *
  * The reference drives a JSON-RPC 2.0 endpoint per VCO
  * (`VCOClient.py:75-98`) from a 10-thread pool; each endpoint call
  * names a method, a params dict, and a `with:[…]` expansion list —
  * which is server-side PROJECTION PUSHDOWN (`powerbi_main_fun.py:
  * 181-185`) — plus interval params, which are PREDICATE pushdown
  * (`465-481`).
  *
  * Spark restatement: fetch happens driver-side (or in a future
  * DataSource V2 partition reader, one partition per (VCO, tenant));
  * the payload lands as JSON lines parsed with a DECLARED schema so
  * the frame is columnar immediately and Catalyst prunes from there.
  * The transport is an interface: tests and offline runs inject fakes
  * (the reference's own UnitTests covered exactly this layer,
  * `requirements.txt:43`).
  */
object VcoSource {

  /** Minimal JSON-RPC transport: returns the `result` array as JSON
    * lines, or an error. Implementations own auth + timeouts.
    */
  trait Transport extends Serializable {
    def call(method: String, paramsJson: String): Either[String, Seq[String]]
  }

  /** Retrying call wrapper (`vco_calls.py:51-73` timeout/retry
    * discipline): linear retries, last error surfaces.
    */
  def callWithRetry(t: Transport, method: String, params: String,
      retries: Int = 2): Either[String, Seq[String]] = {
    var last: Either[String, Seq[String]] = Left("no attempt")
    var i = 0
    while (i <= retries) {
      last = t.call(method, params)
      if (last.isRight) return last
      i += 1
    }
    last
  }

  private def toDf(spark: SparkSession, schema: StructType,
      lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(lines.toDS())
  }

  /** S3 `getEnterpriseEdges` with the license-less degraded-projection
    * fallback (`powerbi_main_fun.py:187-194`): if the full `with`
    * expansion fails, retry WITHOUT `licenses` — the reference's
    * hand-rolled projection fallback, kept as source semantics.
    */
  def enterpriseEdges(spark: SparkSession, t: Transport,
      enterpriseId: Long): DataFrame = {
    val full = Seq("site", "configuration", "recentLinks", "vnfs",
      "licenses", "cloudServices")
    def params(withList: Seq[String]) =
      s"""{"enterpriseId":$enterpriseId,"with":[${withList.mkString("\"", "\",\"", "\"")}]}"""
    val res = callWithRetry(t, "enterprise/getEnterpriseEdges", params(full))
      .left.flatMap(_ =>
        callWithRetry(t, "enterprise/getEnterpriseEdges",
          params(full.filterNot(_ == "licenses"))))
    res match {
      case Right(lines) => toDf(spark, Schemas.edgeDoc, lines)
      case Left(err) => throw new RuntimeException(
        s"getEnterpriseEdges failed after fallback: $err")
    }
  }

  /** S2 `getNetworkEnterprises` (tenant enumeration). */
  def networkEnterprises(spark: SparkSession, t: Transport): DataFrame = {
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("logicalId",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("created",
        org.apache.spark.sql.types.StringType)))
    callWithRetry(t, "network/getNetworkEnterprises",
        """{"with":["edgeCount"]}""") match {
      case Right(lines) => toDf(spark, schema, lines)
      case Left(err) => throw new RuntimeException(s"getNetworkEnterprises: $err")
    }
  }

  /** S14 `getSystemProperties` (`Functions/vco_calls.py:129-137`):
    * the full property list as a (name, value, isReadOnly) frame —
    * a tiny dim, broadcast-joined where consumed.
    */
  def systemProperties(spark: SparkSession, t: Transport): DataFrame = {
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("isReadOnly",
        org.apache.spark.sql.types.BooleanType)))
    callWithRetry(t, "systemProperty/getSystemProperties", "{}") match {
      case Right(lines) => toDf(spark, schema, lines)
      case Left(err) => throw new RuntimeException(s"getSystemProperties: $err")
    }
  }

  /** S14 `get_vco_version` (`Functions/vco_calls.py:117-126`): the
    * `product.version` system property's `value` — a driver-side
    * scalar (the reference upserts it as the VCO's software_version
    * attribute, `powerbi_main_fun.py:106-112`). Absent value ⇒ None,
    * transport failure ⇒ Left, exactly the reference's (data, msg)
    * pair.
    */
  def vcoVersion(t: Transport): Either[String, Option[String]] =
    callWithRetry(t, "systemProperty/getSystemProperty",
        """{"name":"product.version"}""")
      .map { lines =>
        lines.headOption.flatMap { line =>
          "\"value\"\\s*:\\s*\"([^\"]*)\"".r
            .findFirstMatchIn(line).map(_.group(1))
        }
      }

  /** S7 `getEnterpriseEvents` with interval predicate pushdown: the
    * interval lands in the request params — rows outside it are never
    * fetched (the API-source analog of `PushedFilters`).
    */
  def enterpriseEvents(spark: SparkSession, t: Transport, enterpriseId: Long,
      startIso: String, endIso: String): DataFrame = {
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("eventTime",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("edgeName",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("category",
        org.apache.spark.sql.types.StringType)))
    val params =
      s"""{"enterpriseId":$enterpriseId,"interval":{"start":"$startIso","end":"$endIso"}}"""
    callWithRetry(t, "event/getEnterpriseEvents", params) match {
      case Right(lines) => toDf(spark, schema, lines)
      case Left(err) => throw new RuntimeException(s"getEnterpriseEvents: $err")
    }
  }

  /** S11 `getEnterpriseRouteTable` (`powerbi_main_fun.py:383-391`):
    * per-enterprise route-table documents parsed with the declared
    * [[Schemas.routesDoc]]. The enterprise scoping lands in the
    * request params — the same server-side pushdown discipline as the
    * S7 event interval.
    */
  def enterpriseRoutes(spark: SparkSession, t: Transport,
      enterpriseId: Long): DataFrame =
    callWithRetry(t, "enterprise/getEnterpriseRouteTable",
        s"""{"enterpriseId":$enterpriseId}""") match {
      case Right(lines) => toDf(spark, Schemas.routesDoc, lines)
      case Left(err) => throw new RuntimeException(
        s"getEnterpriseRouteTable($enterpriseId): $err")
    }
}
