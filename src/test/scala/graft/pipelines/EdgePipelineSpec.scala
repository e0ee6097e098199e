package graft.pipelines

import java.sql.DriverManager

import graft.SparkSpec
import graft.sinks.JdbcUpsertSink

/** End-to-end gold slice on nested JSON fixtures: declared-schema read,
  * per-document derivations, three upsert-merged gold tables, replay
  * idempotence, and the SLA-style reconciliation (§3.3).
  */
class EdgePipelineSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:edgepipe;create=true"

  // Fixture variants per FIXTURES.md §2: connected with private
  // (sentinel latlon) + backup + wireless links; null logicalId
  // (dropped); sparse document (missing model/site/links → defaults).
  private val fixture = Seq(
    """{"id":1,"logicalId":"e-1","enterpriseId":"c-1","name":"Edge Ône!","edgeState":"CONNECTED",
       "activationState":"ACTIVATED",
       "activationTime":"2024-01-01T00:00:00.000Z","lastContact":"2024-01-11T00:00:00.000Z",
       "buildNumber":"4.5.0","modelNumber":"edge540","haState":"PENDING_INIT",
       "site":{"city":"Palo Alto","country":"US","postalCode":"94040"},
       "recentLinks":[
         {"internalId":"l-1a","displayName":"mpls","lat":37.402866,"lon":-122.117332,"ipAddress":"10.0.0.1","backupState":"UNCONFIGURED","networkType":"ETHERNET"},
         {"internalId":"l-1b","displayName":"lte","lat":37.0,"lon":-122.0,"ipAddress":"10.0.0.2","backupState":"ACTIVE","networkType":"WIRELESS"}]}""",
    """{"id":2,"logicalId":null,"enterpriseId":"c-1","name":"ghost","edgeState":"OFFLINE"}""",
    """{"id":3,"logicalId":"e-3","enterpriseId":"c-2","name":"bare","edgeState":"OFFLINE"}"""
  ).map(_.replaceAll("\n\\s*", ""))

  private def edges = {
    import spark.implicits._
    EdgePipeline.readEdges(spark, fixture.toDS())
  }

  private def queryAll(sql: String): Seq[Seq[Any]] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.toSeq
    } finally conn.close()
  }

  private def ddl(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      for (t <- Seq("Edge", "Links", "EdgeAttributes"))
        try st.executeUpdate(s"DROP TABLE $t") catch { case _: Exception => () }
      st.executeUpdate(
        """CREATE TABLE Edge (EdgeID VARCHAR(36) PRIMARY KEY,
          |  Customer_ID_VCO VARCHAR(36), name VARCHAR(64), Edge_status VARCHAR(20),
          |  Model VARCHAR(30), Version VARCHAR(30), HA BOOLEAN, Activated_Days INT,
          |  Private_links_num INT, Public_links_num INT, BACKUP BOOLEAN,
          |  WIRELESS BOOLEAN, City VARCHAR(60), Country VARCHAR(60),
          |  PostalCode VARCHAR(20))""".stripMargin)
      st.executeUpdate(
        """CREATE TABLE Links (LinkUUID VARCHAR(36), EdgeID VARCHAR(36),
          |  LinkName VARCHAR(60), Linktype VARCHAR(10),
          |  Networktype VARCHAR(20), IP VARCHAR(40), BackupState VARCHAR(20),
          |  PRIMARY KEY (EdgeID, LinkUUID))""".stripMargin)
      st.executeUpdate(
        """CREATE TABLE EdgeAttributes (uuid VARCHAR(36), name VARCHAR(50),
          |  used BOOLEAN, num DOUBLE, text VARCHAR(100), filter_val VARCHAR(100),
          |  PRIMARY KEY (uuid, name))""".stripMargin)
      st.close()
    } finally conn.close()
  }

  test("gold slice: derivations, defaults, and replay idempotence") {
    ddl()
    EdgePipeline.run(edges, url, JdbcUpsertSink.DerbyMerge)
    EdgePipeline.run(edges, url, JdbcUpsertSink.DerbyMerge) // replay

    val edgeRows = queryAll(
      """SELECT EdgeID, name, Model, HA, Activated_Days, Private_links_num,
        |Public_links_num, BACKUP, WIRELESS, City, Country, PostalCode
        |FROM Edge ORDER BY EdgeID""".stripMargin)
    assert(edgeRows.length === 2) // null logicalId dropped
    // e-1: sanitize keeps latin1 Ô; validName is ANCHORED (re.match) so
    // the leading run "Edge " survives; private sentinel counted by lat
    // alone; HA pending; ACTIVATED → 10 days.
    assert(edgeRows(0) === Seq("e-1", "Edge ", "edge540", true, 10,
      1, 1, true, true, "Palo Alto", "United States of America", "94040"))
    // e-3: sparse document → defaults everywhere (not ACTIVATED → 0 days).
    assert(edgeRows(1) === Seq("e-3", "bare", "Not set", false, 0,
      0, 0, false, false, "Not set", "Not set", "Invalid"))

    val linkRows = queryAll(
      "SELECT LinkUUID, EdgeID, Linktype, Networktype FROM Links ORDER BY LinkUUID")
    assert(linkRows === Seq(
      Seq("l-1a", "e-1", "private", "ETHERNET"),
      Seq("l-1b", "e-1", "public", "WIRELESS")))

    val attrRows = queryAll(
      """SELECT uuid, name, num, text, filter_val FROM EdgeAttributes
        |WHERE uuid = 'e-3' ORDER BY name""".stripMargin)
    assert(attrRows === Seq(
      Seq("e-3", "Model", null, "Not set", "Model-True"),
      Seq("e-3", "Private_links_num", 0.0, null, "Private_links_num-True"),
      Seq("e-3", "Public_links_num", 0.0, null, "Public_links_num-True"),
      Seq("e-3", "Version", null, "Not set", "Version-True")))
  }

  test("reconciliation: minimal-path counts equal pipeline output counts") {
    val minimal = EdgePipeline.minimalCounts(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = EdgePipeline.edgeGold(edges)
      .groupBy("Customer_ID_VCO").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(minimal === full)
    assert(minimal === Map("c-1" -> 1L, "c-2" -> 1L))
  }
}
