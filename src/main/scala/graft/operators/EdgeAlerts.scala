package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alert-event classifiers (SURVEY P4/P5/A13 alert side,
  * `update_edge_alerts_based_on_events` `powerbi_main_fun.py:882-903`,
  * `update_edge_alerts_based_on_configuration` `937-1014`).
  *
  * Every classifier emits Events-gold rows (Date, EdgeID, Name, Type)
  * at the month-floor alert date; duplicates collapse on the table's
  * unique key exactly as the reference relies on INSERT IGNORE (K2) —
  * so the emitters dropDuplicates on that key before the sink.
  */
object EdgeAlerts {

  private val out = Seq("Date", "EdgeID", "Name", "Type")

  /** Health/kernel/hub-tunnel alerts from raw events of CONNECTED
    * edges. `isHub` is the broadcast-derived flag ([[Hubs.flagHubs]]);
    * the reference re-scans the configuration list per event row.
    */
  def eventAlerts(events: DataFrame, edgeIdCol: String, eventNameCol: String,
      connected: Column, isHub: Column, alertDate: Column): DataFrame = {
    val name = col(eventNameCol)
    val mapped =
      when(name.isin("EDGE_HEALTH_ALERT", "EDGE_MEMORY_USAGE_ERROR",
        "EDGE_KERNEL_PANIC"), name)
      .when(isHub && name === "EDGE_TUNNEL_CAP_WARNING",
        lit("HUB_TUNNEL_CAP_WARNING"))
    events
      .filter(connected)
      .withColumn("Name", mapped)
      .filter(col("Name").isNotNull)
      .select(alertDate.as("Date"), col(edgeIdCol).as("EdgeID"),
        col("Name"), lit("BADCONFIG").as("Type"))
      .dropDuplicates(out)
  }

  /** Version-membership alerts: the 46-entry outdated list ⇒
    * NOT_RECOMMENDED_VERSION, the ~150-entry EOSL list ⇒
    * END_OF_SUPPORT_LIFE. Both lists arrive as parameters (they are
    * reference data, `powerbi_main_fun.py:944-963,967-1010`) and
    * become broadcast semi-joins — the P5 scale path.
    */
  def versionAlerts(edges: DataFrame, edgeIdCol: String, buildCol: String,
      outdated: Seq[String], eosl: Seq[String], alertDate: Column): DataFrame = {
    def alert(list: Seq[String], eventName: String) =
      Relational.broadcastSetFilter(edges, buildCol, list)
        .select(alertDate.as("Date"), col(edgeIdCol).as("EdgeID"),
          lit(eventName).as("Name"), lit("BADCONFIG").as("Type"))
    alert(outdated, "NOT_RECOMMENDED_VERSION")
      .unionByName(alert(eosl, "END_OF_SUPPORT_LIFE"))
      .dropDuplicates(out)
  }
}
