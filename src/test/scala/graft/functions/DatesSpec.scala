package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DatesSpec extends SparkSpec {

  test("monthFloorAlertDate reproduces the [:-3] quirk") {
    import spark.implicits._
    val out = Seq("2024-08-12 13:45:59")
      .toDF("s").select(Dates.monthFloorAlertDate(col("s").cast("timestamp")))
      .collect().head.getString(0)
    // strftime('%Y-%m-01T00:00:00.000Z')[:-3] == '…T00:00:00.0'
    assert(out === "2024-08-01T00:00:00.0")
  }

  test("epochMs truncates sub-second precision before scaling") {
    import spark.implicits._
    val out = Seq("2024-01-01 00:00:01.999")
      .toDF("s").select(Dates.epochMs(col("s").cast("timestamp")))
      .collect().head.getLong(0)
    assert(out % 1000 === 0)
    assert(out === 1704067201000L)
  }

  test("toHuman uses the reference's double space") {
    import spark.implicits._
    val out = Seq(1704067201000L).toDF("ms")
      .select(Dates.toHuman(col("ms"))).collect().head.getString(0)
    assert(out === "2024-01-01  00:00:01")
  }

  test("toMbps matches the reference formula and rounding") {
    import spark.implicits._
    val out = Seq((375000000L, 300)).toDF("bytes", "tick")
      .select(Dates.toMbps(col("bytes"), col("tick"))).collect().head.getDouble(0)
    assert(out === 10.0) // 375e6*8 / (300*1e6) = 10 Mbps
  }

  test("parseIso handles 1-6 fractional digits like Python %f") {
    import spark.implicits._
    val out = Seq("2024-03-05T06:07:08.090Z", "2024-03-05T06:07:08.1Z",
        "2024-03-05T06:07:08.123456Z", "2024-03-05T06:07:08Z")
      .toDF("s")
      .select(Dates.parseIso(col("s")).cast("string")).collect()
      .map(_.getString(0))
    assert(out.toSeq === Seq("2024-03-05 06:07:08.09", "2024-03-05 06:07:08.1",
      "2024-03-05 06:07:08.123456", "2024-03-05 06:07:08"))
  }
}
