package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J3 hub detection + VNF traversal (edge-document side derivations
  * beyond the gold slice).
  */
object Hubs {

  /** `determine_if_edge_is_hub` (`powerbi_main_fun.py:859-879`): the
    * hub-id set is every `deviceSettings:vpn:edgeHub` ref logicalId
    * across enterprise configurations. The reference scans the config
    * list per edge; here the set is derived once and broadcast.
    */
  def hubIds(configurations: DataFrame): DataFrame =
    configurations
      .select(explode(col("modules")).as("m"))
      .filter(col("m.name") === "deviceSettings")
      .select(col("m.refs").getField("deviceSettings:vpn:edgeHub")
        .getField("data").getField("logicalId").as("hub_id"))
      .filter(col("hub_id").isNotNull)
      .distinct()

  /** Flag edges that are hubs: broadcast left join + presence bit
    * (the semi-join form when only hub rows are wanted is
    * [[Relational.existsIn]]).
    */
  def flagHubs(edges: DataFrame, hubs: DataFrame, idCol: String): DataFrame =
    edges
      .join(broadcast(hubs.withColumn("__is_hub", lit(true))),
        edges(idCol) === hubs("hub_id"), "left")
      .withColumn("is_hub", coalesce(col("__is_hub"), lit(false)))
      .drop("hub_id", "__is_hub")

  /** `update_edge_css` traversal half (`powerbi_main_fun.py:
    * 2486-2520`): has_css = any cloudServices entry regardless of
    * state; css_ip = the FIRST state=UP entry's nvs_ip (the loop
    * breaks on first match). The MaxMind lookup on that ip is external
    * I/O and belongs to the [[graft.sources.GeoEnrichment]] pattern
    * (distinct ips → throttled client → broadcast join), with the
    * reference's `city = coalesce(city, country)` fallback applied on
    * the joined columns.
    */
  def cssAttrs(cloudServices: Column): Column = {
    val hasCss = coalesce(size(cloudServices) > 0, lit(false))
    val firstUp = get(filter(cloudServices,
      s => s.getField("state") === "UP"), lit(0))
    struct(
      hasCss.as("has_css"),
      when(hasCss, coalesce(firstUp.getField("nvs_ip"), lit("")))
        .otherwise(lit("")).as("css_ip"))
  }

  /** `edge_update_software_version` (`powerbi_main_fun.py:2470-2484`):
    * empty string normalizes to null before the EAV upsert.
    */
  def softwareVersion(c: Column): Column = nullif(c, lit(""))

  /** `update_edge_vnf` (`powerbi_main_fun.py:2401-2434`): securityVnf
    * vms[0].data traversal. has_vnf = insertionEnabled; type/vendor
    * only read when has_vnf (reference leaves '' / False otherwise —
    * we emit null text and false, the typed form); vnf_on = NOT
    * vmPowerOff, false when absent.
    */
  def vnfAttrs(vnfs: Column): Column = {
    val data = get(vnfs.getField("securityVnf").getField("vms"), lit(0))
      .getField("data")
    val hasVnf = coalesce(data.getField("insertionEnabled"), lit(false))
    struct(
      hasVnf.as("has_vnf"),
      when(hasVnf, data.getField("type")).as("vnf_type"),
      when(hasVnf, data.getField("vendor")).as("vnf_vendor"),
      when(hasVnf, !coalesce(data.getField("vmPowerOff"), lit(false)))
        .otherwise(lit(false)).as("vnf_on"))
  }
}
