package graft.queries

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.sinks.JdbcUpsertSink

/** q50: the K1 sink round-trip oracle row (VERDICT r3 item 3).
  *
  * A derived frame is merged into embedded Derby TWICE through
  * [[JdbcUpsertSink]] (the replay — the reference re-runs its
  * `INSERT … ON DUPLICATE KEY UPDATE` loop on every schedule,
  * `Functions/sql_upserts.py:51-88`), read back over JDBC, and
  * compared to the DuckDB oracle of the derivation alone. A green
  * hash therefore proves write→merge→read fidelity AND idempotence
  * under the driver's gate, not just in a spec.
  *
  * The query fn is re-entrant (Bench calls it repeatedly): each call
  * gets a fresh in-memory Derby database keyed by nanoTime.
  */
object SinkQueries extends QueryPack {

  def defs: Map[String, Q] = Map(
    "q50_sink_roundtrip" -> Q(
      (s, dir) => {
        val derived = Tables.customer(s, dir)
          .groupBy(col("c_nationkey").cast("int").as("nk"))
          .agg(count(lit(1)).as("n_cust"),
            sum(col("c_acctbal").cast(DecimalType(18, 2)))
              .cast(DecimalType(28, 2)).as("total_bal"))
        val url = s"jdbc:derby:memory:roundtrip${System.nanoTime()};create=true"
        val conn = DriverManager.getConnection(url)
        try conn.createStatement().executeUpdate(
          "CREATE TABLE nation_stats (nk INT PRIMARY KEY, n_cust BIGINT, " +
            "total_bal DECIMAL(28,2))")
        finally conn.close()
        // coalesce(1): a 25-row frame needs one connection, not one
        // per shuffle partition (the sink's own guidance)
        val once = derived.coalesce(1)
        JdbcUpsertSink.write(once, url, "nation_stats", Seq("nk"),
          JdbcUpsertSink.DerbyMerge)
        JdbcUpsertSink.write(once, url, "nation_stats", Seq("nk"),
          JdbcUpsertSink.DerbyMerge) // replay: merge must be a no-op
        s.read.format("jdbc").option("url", url)
          .option("dbtable", "nation_stats").load()
          .select(col("NK").as("nk"), col("N_CUST").as("n_cust"),
            col("TOTAL_BAL").cast("double").as("total_bal"))
          .orderBy(col("nk"))
      },
      Some("""SELECT CAST(c_nationkey AS INT) AS nk, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |GROUP BY 1
        |ORDER BY nk""".stripMargin))
  )
}
