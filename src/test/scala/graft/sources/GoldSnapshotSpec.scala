package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Relational
import graft.sinks.JdbcUpsertSink

/** S19 + P9 + K1 end-to-end: the incremental-refresh loop — read the
  * gold snapshot over JDBC, anti-join candidates against fresh rows,
  * recompute only the stale/missing slice, merge it back.
  */
class GoldSnapshotSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:goldsnap;create=true"

  test("incremental refresh: only stale/missing entities recompute and merge") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE Customer") catch { case _: Exception => () }
      st.executeUpdate(
        """CREATE TABLE Customer (id VARCHAR(10) PRIMARY KEY,
          |  name VARCHAR(40), lastUpdated TIMESTAMP)""".stripMargin)
      st.executeUpdate("INSERT INTO Customer VALUES" +
        "('c-1', 'fresh-old-name', TIMESTAMP('2024-01-10 00:00:00'))," +
        "('c-2', 'stale-name', TIMESTAMP('2023-11-01 00:00:00'))")
      st.close()
    } finally conn.close()

    val candidates = Seq(
      ("c-1", "api-name-1"), ("c-2", "api-name-2"), ("c-3", "api-name-3")
    ).toDF("id", "name")

    val snapshot = GoldSnapshot.read(spark, url, "Customer")
    assert(snapshot.count() === 2)

    val toRefresh = Relational.staleOrMissing(candidates, snapshot, Seq("id"),
      "lastUpdated", lit("2024-01-01 00:00:00").cast("timestamp"))
    val refreshed = toRefresh.withColumn("lastUpdated",
      lit("2024-01-15 00:00:00").cast("timestamp"))
    JdbcUpsertSink.write(refreshed, url, "Customer", Seq("id"),
      JdbcUpsertSink.DerbyMerge)

    val after = GoldSnapshot.read(spark, url, "Customer")
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // c-1 fresh → untouched; c-2 stale → updated; c-3 missing → inserted
    assert(after.toSeq === Seq(
      ("c-1", "fresh-old-name"), ("c-2", "api-name-2"), ("c-3", "api-name-3")))
  }
}
