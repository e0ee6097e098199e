package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J1: link-metrics × WAN-config enrichment and the overlay link row
  * (`update_edge_links` / `update_edge_overlay_link`,
  * `powerbi_main_fun.py:1612-1697`).
  */
object Links {

  /** Edge-specific WAN links flattened to (edgeId, wan struct) rows —
    * the build side of the J1 join. Every "Edge Specific Profile"
    * stack entry's WAN module contributes (the reference loops them
    * all).
    */
  def wanLinks(stacks: DataFrame, edgeIdCol: String): DataFrame = {
    val esp = filter(col("stack"),
      l => l.getField("name") === "Edge Specific Profile")
    val wanModules = flatten(transform(esp, l =>
      filter(l.getField("modules"), m => m.getField("name") === "WAN")))
    stacks.select(col(edgeIdCol),
        explode(flatten(transform(wanModules,
          m => coalesce(m.getField("data").getField("links"),
            array().cast(org.apache.spark.sql.types.ArrayType(
              graft.model.Schemas.wanLink)))))).as("wan"))
  }

  /** The Links-gold enrichment: one row per link metric, decorated
    * from the matching WAN config link (match on internalId; the
    * reference's loop takes the LAST match — internalIds are unique
    * per edge, so an equi-join is equivalent), with the reference's
    * "Not set" defaults and the `mode=='Private' ⇒ ISP='MPLS'`
    * override. MTU/VLANID become "Not set" strings when unmatched —
    * the reference's mixed-type column, kept as string.
    */
  def enrichLinkMetrics(metrics: DataFrame, edgeIdCol: String,
      wan: DataFrame, wanEdgeIdCol: String): DataFrame = {
    val m = metrics.select(
      col(edgeIdCol).as("EdgeID"),
      col("link").getField("internalId").as("LinkUUID"),
      coalesce(col("link").getField("displayName"), lit("Not set")).as("LinkName"),
      col("link").getField("interface").as("Interface"),
      col("link").getField("lat").as("Latitude"),
      col("link").getField("lon").as("Longitude"),
      col("link").getField("networkSide").as("NetworkSide"),
      col("link").getField("networkType").as("Networktype"),
      // the reference initializes LinkIpAddress=False; typed null here
      col("link").getField("ipAddress").as("IP"))
    val w = wan.select(
      // join carries the EDGE scope too: internalIds are only unique
      // per edge, and the reference scans only the same edge's stack
      col(wanEdgeIdCol).as("EdgeID"),
      col("wan").getField("internalId").as("LinkUUID"),
      lit(true).as("__matched"),
      col("wan").getField("MTU").cast("string").as("__mtu"),
      col("wan").getField("isp").as("__isp"),
      col("wan").getField("discovery").as("__overlay"),
      col("wan").getField("type").as("__ltype"),
      col("wan").getField("mode").as("__lmode"),
      col("wan").getField("vlanId").cast("string").as("__vlan"))
    // "Not set" means UNMATCHED only; a matched link keeps its raw
    // (possibly null) config values, exactly like the reference's
    // unconditional overwrite on match (powerbi_main_fun.py:1657-1665)
    def matched(c: Column): Column =
      when(col("__matched"), c).otherwise(lit("Not set"))
    m.join(broadcast(w), Seq("EdgeID", "LinkUUID"), "left")
      .withColumn("LinkID", concat(col("EdgeID"), lit("-"), col("LinkUUID")))
      .withColumn("MTU", matched(col("__mtu")))
      .withColumn("LinkMode", matched(col("__lmode")))
      .withColumn("ISP", matched(
        when(col("__lmode") === "Private", "MPLS").otherwise(col("__isp"))))
      .withColumn("OverlayType", matched(col("__overlay")))
      .withColumn("Linktype", matched(col("__ltype")))
      .withColumn("VLANID", matched(col("__vlan")))
      .drop("__matched", "__mtu", "__isp", "__overlay", "__ltype", "__lmode", "__vlan")
  }

  /** `update_edge_overlay_link` (`powerbi_main_fun.py:1673-1697`): one
    * synthetic OVERLAY row per edge, constants as written.
    */
  def overlayLinkRows(edges: DataFrame, edgeIdCol: String): DataFrame =
    edges.select(
      col(edgeIdCol).as("EdgeID"),
      concat(col(edgeIdCol), lit("-OVERLAY")).as("LinkUUID"),
      concat(col(edgeIdCol), lit("-"), col(edgeIdCol), lit("-OVERLAY")).as("LinkID"),
      lit("OVERLAY").as("LinkName"),
      lit("VeloCloud").as("ISP"),
      lit("null0").as("Interface"),
      lit(0.0d).as("Latitude"),
      lit(0.0d).as("Longitude"),
      lit("OVERLAY").as("NetworkSide"),
      lit("OVERLAY").as("Networktype"),
      lit("0.0.0.0").as("IP"),
      lit("0").as("MTU"),
      lit("OVERLAY_DEFINED").as("OverlayType"),
      lit("OVERLAY").as("Linktype"),
      lit("OVERLAY").as("LinkMode"),
      lit("0").as("VLANID"))
}
