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

  test("toEavTyped: caller-passed used, overrides, and the None filter_val") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wide = Seq(("e1", true, "fw-vendor", 3))
      .toDF("uuid", "vnf_on", "vendor", "routes")
    val eav = Melt.toEavTyped(wide, "uuid", Seq(
      // used independent of payload (the vnf_on pattern)
      Melt.Attr("vnf_on", used = col("vnf_on")),
      // text payload with used from a different column
      Melt.Attr("vnf_vendor", used = col("vnf_on"), text = col("vendor")),
      // null used → Python 'None' in filter_val
      Melt.Attr("maybe", used = lit(null).cast("boolean")),
      // explicit filter_val override (the contract's escape hatch)
      Melt.Attr("routes", used = lit(true), num = col("routes").cast("double"),
        filterVal = Some(concat(lit("routes-"), col("routes"))))
    )).orderBy("name").collect()
      .map(r => (r.getString(1), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), r.getString(5)))
    assert(eav.toSeq === Seq(
      ("maybe", None, None, None, "maybe-None"),
      ("routes", Some(true), Some(3.0), None, "routes-3"),
      ("vnf_on", Some(true), None, None, "vnf_on-True"),
      ("vnf_vendor", Some(true), None, Some("fw-vendor"), "vnf_vendor-True")))
  }

  test("pyBool renders True/False/None exactly as Python f-strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(Some(true), Some(false), None).toDF("b")
      .select(Melt.pyBool(col("b")).as("s")).collect().map(_.getString(0))
    assert(rows.toSeq === Seq("True", "False", "None"))
  }
}
