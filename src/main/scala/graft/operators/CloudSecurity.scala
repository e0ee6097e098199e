package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cloud-security-service attributes (`update_edge_css`,
  * `powerbi_main_fun.py:2486-2540`): the CSS flag, the active
  * tunnel's IP, and its MaxMind-resolved organization/country/city,
  * melted into five EAV rows per edge.
  */
object CloudSecurity {

  /** Per-edge CSS fields: `has_css` is true when cloudServices is
    * present and non-empty REGARDLESS of state (reference comment,
    * line 2497); `css_ip` is the nvs_ip of the FIRST service whose
    * state is 'UP' (the reference's `break`), or the initialized
    * empty string when none is UP.
    */
  def cssFields(edges: DataFrame): DataFrame =
    edges.filter(col("logicalId").isNotNull).select(
      col("logicalId").as("EdgeID"),
      (coalesce(size(col("cloudServices")), lit(0)) > 0).as("has_css"),
      coalesce(
        get(filter(col("cloudServices"),
          s => s.getField("state") === "UP"), lit(0)).getField("nvs_ip"),
        lit("")).as("css_ip"))

  /** The five EAV rows. `used` is `has_css` for ALL of them (the
    * reference passes `used=has_css` on every upsert, lines
    * 2523-2539), and the geo fields default to the reference's
    * initialized '' when unresolved.
    */
  def cssAttributes(enriched: DataFrame): DataFrame =
    Melt.toEavTyped(enriched, "EdgeID", Seq(
      Melt.Attr("has_css", used = col("has_css")),
      Melt.Attr("css_ip", used = col("has_css"), text = col("css_ip")),
      Melt.Attr("css_organization", used = col("has_css"),
        text = coalesce(col("css_organization"), lit(""))),
      Melt.Attr("css_country", used = col("has_css"),
        text = coalesce(col("css_country"), lit(""))),
      Melt.Attr("css_city", used = col("has_css"),
        text = coalesce(col("css_city"), lit("")))))
}
