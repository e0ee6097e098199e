package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.SparkSpec

object CountingGeoClient {
  val calls = new AtomicInteger(0)
}

/** Top-level so the closure serializes without capturing the suite. */
class FakeGeoClient extends GeoEnrichment.GeoClient {
  def reverse(lat: Double, lon: Double): Option[GeoEnrichment.GeoResult] = {
    CountingGeoClient.calls.incrementAndGet()
    if (lat < 0) None
    else Some(GeoEnrichment.GeoResult(s"city-$lat", s"country-$lon", "00000"))
  }
}

class GeoEnrichmentSpec extends SparkSpec {

  test("enrich resolves distinct coords once, broadcast-joins back, keeps nulls") {
    import spark.implicits._
    CountingGeoClient.calls.set(0)
    val df = Seq(
      (1L, Some(37.1234567), Some(-122.0)),
      (2L, Some(37.1234567), Some(-122.0)), // same coords as 1 (after rounding)
      (3L, Some(-5.0), Some(9.0)),          // client returns None
      (4L, None, None)                       // null coords: no call
    ).toDF("id", "latitude", "longitude")

    val out = GeoEnrichment.enrich(df, "latitude", "longitude",
        () => new FakeGeoClient, maxCallsPerSecond = 1000)
      .select(col("id"), col("geo_city"), col("geo_country"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))

    assert(out.toSeq === Seq(
      (1L, Some("city-37.1235"), Some("country--122.0")),
      (2L, Some("city-37.1235"), Some("country--122.0")),
      (3L, None, None),
      (4L, None, None)))
    // 2 distinct non-null coordinate pairs → exactly 2 external calls
    assert(CountingGeoClient.calls.get() === 2)
  }

  test("enrich fails loudly when the distinct set exceeds the driver bound") {
    import spark.implicits._
    CountingGeoClient.calls.set(0)
    val df = (1 to 10).map(i => (i.toLong, i.toDouble, i.toDouble))
      .toDF("id", "latitude", "longitude")
    val e = intercept[IllegalArgumentException] {
      GeoEnrichment.enrich(df, "latitude", "longitude",
        () => new FakeGeoClient, maxCallsPerSecond = 1000,
        maxDistinctCoords = 5L)
    }
    assert(e.getMessage.contains("exceed the driver-materialization bound"))
    // the guard fires BEFORE any throttled external call
    assert(CountingGeoClient.calls.get() === 0)
  }
}
