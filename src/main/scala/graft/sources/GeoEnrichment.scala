package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S20/J4: external geocoding enrichment, restated for scale.
  *
  * The reference reverse-geocodes INSIDE the per-edge loop with a 10 s
  * sleep per call (`powerbi_main_fun.py:624-652,695-781`) — a live
  * network call per row. The Spark-correct shape is:
  *
  *  1. `distinct` the coordinate keys (the real cardinality is tiny
  *     versus the fact table — dedupe BEFORE any external call);
  *  2. resolve the distinct set with `mapPartitions`: one client per
  *     partition, an in-partition cache, and a token-bucket throttle
  *     (rate limits are per-partition, so cap parallelism by
  *     `repartition(n)` to bound the global call rate);
  *  3. broadcast-join the resolved dimension back to the fact rows —
  *     the fact table never waits on the network.
  *
  * The client is an interface so tests (and offline runs) inject a
  * deterministic fake — SURVEY §7.4.6's recorded-response pattern.
  */
object GeoEnrichment {

  /** One resolved location. */
  final case class GeoResult(city: String, country: String, postalCode: String)

  /** External service interface; implementations own connection +
    * credential lifecycle per partition.
    */
  trait GeoClient extends Serializable {
    def reverse(lat: Double, lon: Double): Option[GeoResult]
  }

  /** One resolved IP (the MaxMind `insights` response subset the
    * reference consumes, `powerbi_main_fun.py:2506-2517`).
    */
  final case class IpGeoResult(organization: String, country: String,
      city: String)

  /** IP-intelligence service interface (`geoip2.webservice.Client`
    * analog); implementations own credentials per partition.
    */
  trait IpGeoClient extends Serializable {
    def insights(ip: String): Option[IpGeoResult]
  }

  private val ipResolvedSchema = StructType(Seq(
    StructField("__ip", StringType),
    StructField("css_organization", StringType),
    StructField("css_country", StringType),
    StructField("css_city", StringType)))

  /** The MaxMind/IP half of S20 (`update_edge_css`,
    * `powerbi_main_fun.py:2496-2519`): resolve the DISTINCT IPs of
    * `ipCol` through `client` (throttled, cached per partition) and
    * broadcast-join organization/country/city back. The reference
    * calls the web service once per edge INSIDE the row loop; the
    * scale shape is identical to the coordinate half — dedupe first,
    * resolve the tiny distinct set, join back. City falls back to
    * country when the service has no city (reference line 2514-2515).
    * Same eager-at-call-time semantics and driver bound as [[enrich]].
    */
  def enrichIp(df: DataFrame, ipCol: String,
      clientFactory: () => IpGeoClient, maxCallsPerSecond: Int = 10,
      maxDistinctIps: Long = 1000000L): DataFrame = {
    // persist: the guard's count() and the resolution's collect()
    // must not each re-run the scan+distinct shuffle; the explicit
    // unpersist below bounds the cache lifetime
    val distinctIps = df.select(col(ipCol).as("__ip"))
      .filter(col("__ip").isNotNull && col("__ip") =!= "")
      .distinct()
      .persist()
    val nIps = distinctIps.count()
    if (nIps > maxDistinctIps) {
      distinctIps.unpersist()
      throw new IllegalArgumentException(
        s"GeoEnrichment: $nIps distinct IPs exceed the " +
          s"driver-materialization bound $maxDistinctIps")
    }
    val minIntervalNanos = 1000000000L / math.max(1, maxCallsPerSecond)
    val resolvedRdd = distinctIps.rdd.mapPartitions { it =>
      val client = clientFactory()
      val cache = scala.collection.mutable.HashMap.empty[String, Option[IpGeoResult]]
      var lastCall = 0L
      it.map { r =>
        val ip = r.getString(0)
        val res = cache.getOrElseUpdate(ip, {
          val wait = lastCall + minIntervalNanos - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          lastCall = System.nanoTime()
          client.insights(ip)
        })
        Row(ip,
          res.map(_.organization).orNull,
          res.map(_.country).orNull,
          res.flatMap(x => Option(x.city).orElse(Option(x.country))).orNull)
      }
    }
    import scala.jdk.CollectionConverters._
    val resolvedRows =
      try resolvedRdd.collect().toSeq
      finally distinctIps.unpersist()
    val resolved = df.sparkSession.createDataFrame(
      resolvedRows.asJava, ipResolvedSchema)
    df.join(broadcast(resolved), df(ipCol) === resolved("__ip"), "left")
      .drop("__ip")
  }

  private val resolvedSchema = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("geo_city", StringType),
    StructField("geo_country", StringType),
    StructField("geo_postal", StringType)))

  /** Resolve the DISTINCT (lat, lon) pairs of `df` through `client`,
    * at most `maxCallsPerSecond` calls per partition, then
    * broadcast-join the results back. Coordinates are rounded to
    * `precision` decimals first — the reference's 1 %-resample
    * throttle (P10) becomes a deterministic cache key instead.
    */
  /** NOTE: eager at call time — the distinct-coordinate resolution
    * (and therefore every throttled external call) executes INSIDE
    * this method so the dim is materialized exactly once; the
    * returned frame only carries the broadcast join. The implicit
    * contract is that the distinct coordinate set fits on the driver:
    * `maxDistinctCoords` makes that bound explicit — a mis-rounded
    * `precision` (or a 100× fleet) fails with a clear message instead
    * of a driver OOM.
    */
  def enrich(df: DataFrame, latCol: String, lonCol: String,
      clientFactory: () => GeoClient, maxCallsPerSecond: Int = 10,
      precision: Int = 4, maxDistinctCoords: Long = 1000000L): DataFrame = {
    val keyed = df
      .withColumn("lat", round(col(latCol), precision))
      .withColumn("lon", round(col(lonCol), precision))
    // persist: the guard's count() and the resolution's collect()
    // must not each re-run the scan+distinct shuffle (the unpersist
    // below gives the cache an explicit lifetime)
    val distinctCoords = keyed.select(col("lat"), col("lon"))
      .filter(col("lat").isNotNull && col("lon").isNotNull)
      .distinct()
      .persist()

    // guard BEFORE the throttled calls and the driver materialization:
    // counting is one cheap distributed pass over the distinct set
    val nCoords = distinctCoords.count()
    if (nCoords > maxDistinctCoords) {
      distinctCoords.unpersist()
      throw new IllegalArgumentException(
        s"GeoEnrichment: $nCoords distinct coordinates exceed the " +
          s"driver-materialization bound $maxDistinctCoords — raise " +
          "maxDistinctCoords deliberately or coarsen `precision` " +
          s"(currently $precision decimals)")
    }

    val minIntervalNanos = 1000000000L / math.max(1, maxCallsPerSecond)
    val resolvedRdd = distinctCoords.rdd.mapPartitions { it =>
      val client = clientFactory()
      val cache = scala.collection.mutable.HashMap.empty[(Double, Double), Option[GeoResult]]
      var lastCall = 0L
      it.map { r =>
        val key = (r.getDouble(0), r.getDouble(1))
        val res = cache.getOrElseUpdate(key, {
          val wait = lastCall + minIntervalNanos - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          lastCall = System.nanoTime()
          client.reverse(key._1, key._2)
        })
        Row(key._1, key._2,
          res.map(_.city).orNull, res.map(_.country).orNull,
          res.map(_.postalCode).orNull)
      }
    }
    // Materialize the resolved dim ONCE, driver-side: without this,
    // every downstream action re-executes the throttled external
    // calls (each broadcast re-materializes the lineage). The dim is
    // the distinct coordinate set, which broadcast ships through the
    // driver anyway — collecting it is the same data movement with an
    // explicit lifetime; the distinct-set cache is released here too.
    import scala.jdk.CollectionConverters._
    val resolvedRows =
      try resolvedRdd.collect().toSeq
      finally distinctCoords.unpersist()
    val resolved = df.sparkSession.createDataFrame(
      resolvedRows.asJava, resolvedSchema)
    keyed.join(broadcast(resolved), Seq("lat", "lon"), "left")
  }
}
