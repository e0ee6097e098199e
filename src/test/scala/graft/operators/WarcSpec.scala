package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content-Length walk vs adversarial container shapes — the cases a
  * marker-scanning parser gets wrong.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  private def parse(warc: String, maxRecords: Int = 8) =
    Warc.parseRecords(Seq((1L, warc)).toDF("f", "warc"), "f", "warc",
        maxRecords)
      .orderBy(col("rec_idx"))
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4)))

  test("fake banner inside a payload does not derail the walk") {
    val trap = "x WARC/1.0\r\nContent-Length: 7\r\n\r\n trap y"
    val got = parse(rec("http://a/1", trap) + rec("http://a/2", ""))
    assert(got.toSeq === Seq(
      (0L, "http://a/1", trap.length.toLong, trap),
      (1L, "http://a/2", 0L, "")))
  }

  test("torn tail is dropped; trailing garbage ends the walk") {
    val whole = rec("http://a/1", "alpha beta")
    val torn = rec("http://a/2", "gamma delta epsilon")
    assert(parse(whole + torn.dropRight(12)).toSeq ===
      Seq((0L, "http://a/1", 10L, "alpha beta")))
    assert(parse(whole + "WARC/0.9 junk").toSeq ===
      Seq((0L, "http://a/1", 10L, "alpha beta")))
    assert(parse("").isEmpty)
  }

  test("maxRecords truncates the walk, not the records") {
    val w = (1 to 5).map(i => rec(s"http://a/$i", s"p$i")).mkString
    assert(parse(w, maxRecords = 3).map(_._2).toSeq ===
      Seq("http://a/1", "http://a/2", "http://a/3"))
    assert(parse(w, maxRecords = 8).length === 5)
  }

  test("buildContainers orders records by id regardless of partition") {
    val df = Seq((7L, 1L, "u7", "p7"), (3L, 1L, "u3", "p3"),
      (5L, 1L, "u5", "p5")).toDF("id", "f", "uri", "payload")
      .repartition(3)
    val warc = Warc.buildContainers(df, "f", "id", "uri", "payload")
      .collect().head.getString(1)
    val got = parse(warc).map(_._2).toSeq
    assert(got === Seq("u3", "u5", "u7"))
  }
}
