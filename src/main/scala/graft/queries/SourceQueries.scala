package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{GeoEnrichment, TransportFactory, VcoSource}

/** In-JVM scripted fleet: the "server" payloads the q64 scan reads.
  *
  * The gate needs the DSv2 connector to produce rows whose ground
  * truth DuckDB can recompute, so the fixture server's payloads are
  * DERIVED from the customer parquet — the query function publishes
  * them here, then reads them back through the full connector path
  * (partition-per-VCO planning, executor-side transport construction,
  * JSON→InternalRow parse, column pruning, residual filters).
  *
  * A static holder works because tests and the driver run local[*]
  * (executors share the JVM); a cluster integration test would serve
  * the same payloads over [[graft.sources.HttpTransport]] instead.
  */
object ScriptedFleet {
  @volatile var byVco: Map[String, Seq[String]] = Map.empty
}

/** Zero-arg-constructible factory (the connector instantiates it by
  * name on the executor — transports own sockets and never serialize).
  */
class ScriptedFleetTransportFactory extends TransportFactory {
  def create(): VcoSource.Transport = new VcoSource.Transport {
    def call(method: String, paramsJson: String): Either[String, Seq[String]] = {
      val vco = "\"vco\":\"([^\"]+)\"".r.findFirstMatchIn(paramsJson)
        .map(_.group(1)).getOrElse("")
      ScriptedFleet.byVco.get(vco).toRight(s"unknown vco '$vco'")
    }
  }
}

/** Deterministic geocoder: resolves the formula the q66 oracle
  * recomputes. lat/lon arrive as exact quarter-integers by
  * construction, so `math.round` recovers the integers losslessly.
  */
object FormulaGeoClient extends GeoEnrichment.GeoClient {
  def reverse(lat: Double, lon: Double): Option[GeoEnrichment.GeoResult] = {
    val a = math.round(lat * 4)
    val b = math.round(lon * 4)
    Some(GeoEnrichment.GeoResult(s"city-$a-$b", s"country-${a % 5}", s"p$b"))
  }
}

/** q64/q66: the external-source operators under the ORACLE gate — the
  * DSv2 JSON-RPC connector (S1/S3 mechanics) and the throttled
  * geo-enrichment dimension build (S20/J4). Both run their REAL code
  * paths end-to-end; only the remote endpoint is a deterministic
  * in-process stand-in, which is exactly what makes a SQL oracle
  * possible.
  */
object SourceQueries extends QueryPack {

  def defs: Map[String, Q] = Map(
    // S1/S3 + DSv2 pruning/residual filters: customer rows → edge-doc
    // JSON payloads on a 4-VCO scripted fleet → full connector scan →
    // must equal the relational truth. The edgeState filter is
    // residual-only (not a pushable shape); pruning narrows the parse
    // schema to the six selected fields.
    "q64_vco_scan" -> Q(
      (s, dir) => {
        import s.implicits._
        val payloads = Tables.customer(s, dir).select(
            concat(lit("vco-"), col("c_custkey") % 4).as("vco"),
            to_json(struct(
              col("c_custkey").as("id"),
              concat(lit("edge-"), col("c_custkey")).as("logicalId"),
              concat(lit("ent-"), col("c_nationkey")).as("enterpriseId"),
              col("c_name").as("name"),
              when(col("c_acctbal") < 0, "OFFLINE").otherwise("CONNECTED")
                .as("edgeState"),
              col("c_mktsegment").as("modelNumber"))).as("doc"))
          .as[(String, String)].collect() // fixture-server dataset, not a query-path collect
        ScriptedFleet.byVco =
          payloads.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
        s.read.format("graft-vco")
          .option("vcos", ScriptedFleet.byVco.keys.toSeq.sorted.mkString(","))
          .option("transport", classOf[ScriptedFleetTransportFactory].getName)
          .load()
          .filter(col("edgeState") === "CONNECTED")
          .select(col("id"), col("logicalId"), col("enterpriseId"),
            col("name"), col("edgeState"), col("modelNumber"))
          .orderBy(col("id"))
      },
      Some("""SELECT c_custkey AS id, 'edge-'||c_custkey AS logicalId,
        |  'ent-'||c_nationkey AS enterpriseId, c_name AS name,
        |  'CONNECTED' AS edgeState, c_mktsegment AS modelNumber
        |FROM customer
        |WHERE c_acctbal >= 0
        |ORDER BY id""".stripMargin)),

    // S20/J4: distinct→resolve(throttled, cached)→broadcast-join-back.
    // Coordinates are exact quarter-integers so the precision-4
    // rounding is an identity and the formula client's strings are
    // reproducible in SQL from the source columns alone.
    "q66_geo_enrich" -> Q(
      (s, dir) => GeoEnrichment.enrich(
          Tables.customer(s, dir).select(col("c_custkey"),
            (col("c_nationkey") / lit(4.0d)).as("latr"),
            ((col("c_custkey") % 100) / lit(4.0d)).as("lonr")),
          "latr", "lonr", () => FormulaGeoClient,
          maxCallsPerSecond = 1000000000)
        .select(col("c_custkey"), col("geo_city"), col("geo_country"),
          col("geo_postal"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
        |  'city-'||c_nationkey||'-'||(c_custkey % 100) AS geo_city,
        |  'country-'||(c_nationkey % 5) AS geo_country,
        |  'p'||(c_custkey % 100) AS geo_postal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin))
  )
}
