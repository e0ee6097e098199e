package graft.operators

import graft.SparkSpec

/** EAV melt contract (`fun_mysql_inserts.py:347-374`): one row per
  * (uuid, attribute); filter_val uses Python boolean capitalization.
  */
class MeltSpec extends SparkSpec {

  test("toEav melts wide columns with Python-style filter_val") {
    import spark.implicits._
    val wide = Seq(
      ("e1", Some(3), Some("gold")),
      ("e2", None, None)
    ).toDF("uuid", "route_num", "license_text")

    val eav = Melt.toEav(wide, "uuid",
        numAttrs = Seq("route_num"), textAttrs = Seq("license_text"))
      .orderBy("uuid", "name")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
                 Option(r.get(3)), Option(r.get(4)), r.getString(5)))

    assert(eav.toSeq === Seq(
      ("e1", "license_text", true, None, Some("gold"), "license_text-True"),
      ("e1", "route_num", true, Some(3.0), None, "route_num-True"),
      ("e2", "license_text", false, None, None, "license_text-False"),
      ("e2", "route_num", false, None, None, "route_num-False")))
  }

  test("pyBool renders True/False/None exactly as Python f-strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(Some(true), Some(false), None).toDF("b")
      .select(Melt.pyBool(col("b")).as("s")).collect().map(_.getString(0))
    assert(rows.toSeq === Seq("True", "False", "None"))
  }
}
