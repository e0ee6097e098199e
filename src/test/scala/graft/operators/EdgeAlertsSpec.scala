package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EdgeAlertsSpec extends SparkSpec {

  test("eventAlerts: connected-only, name mapping, hub rename, dedup") {
    import spark.implicits._
    val events = Seq(
      ("e-1", "EDGE_HEALTH_ALERT", "CONNECTED", false),
      ("e-1", "EDGE_HEALTH_ALERT", "CONNECTED", false), // dup collapses
      ("e-1", "EDGE_KERNEL_PANIC", "CONNECTED", false),
      ("e-2", "EDGE_TUNNEL_CAP_WARNING", "CONNECTED", true),  // hub → renamed
      ("e-3", "EDGE_TUNNEL_CAP_WARNING", "CONNECTED", false), // non-hub → nothing
      ("e-4", "EDGE_HEALTH_ALERT", "OFFLINE", false),         // not connected
      ("e-5", "LINK_UP", "CONNECTED", false)                  // unlisted event
    ).toDF("edge_id", "event", "state", "is_hub")
    val got = EdgeAlerts.eventAlerts(events, "edge_id", "event",
        col("state") === "CONNECTED", col("is_hub"),
        lit("2024-08-01T00:00:00.0"))
      .orderBy("EdgeID", "Name").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(
      ("e-1", "EDGE_HEALTH_ALERT", "BADCONFIG"),
      ("e-1", "EDGE_KERNEL_PANIC", "BADCONFIG"),
      ("e-2", "HUB_TUNNEL_CAP_WARNING", "BADCONFIG")))
  }

  test("versionAlerts: outdated and EOSL membership via broadcast sets") {
    import spark.implicits._
    val edges = Seq(
      ("e-1", "R31-OLD"), ("e-2", "R15-EOSL"), ("e-3", "R400-CURRENT")
    ).toDF("edge_id", "buildNumber")
    val got = EdgeAlerts.versionAlerts(edges, "edge_id", "buildNumber",
        outdated = Seq("R31-OLD", "R32-OLD"), eosl = Seq("R15-EOSL"),
        alertDate = lit("2024-08-01T00:00:00.0"))
      .orderBy("EdgeID").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("e-1", "NOT_RECOMMENDED_VERSION"), ("e-2", "END_OF_SUPPORT_LIFE")))
  }
}
