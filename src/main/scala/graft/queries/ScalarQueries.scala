package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Dates
import graft.operators.Relational

/** q37–q38: scalar date/epoch functions (F6–F10, reference quirks
  * included) and the broadcast large-set membership filter (P5).
  */
object ScalarQueries extends QueryPack {

  /** The reference's 46-entry outdated-version list analog: version
    * strings synthesized from the row key so a large literal set
    * exercises the broadcast path on synthetic data.
    */
  private val BadVersions: Seq[String] = (0 until 46).map(i => s"v$i")

  def defs: Map[String, Q] = Map(
    // F7/F8/F9/F10: epoch truncation, day diffs, the month-floor
    // alert-stamp [:-3] quirk, Mbps rounding, double-space human form.
    "q37_date_functions" -> Q(
      (s, dir) => Tables.orders(s, dir).select(
          col("o_orderkey"),
          Dates.monthFloorAlertDate(col("o_orderdate")).as("alert_date"),
          Dates.epochMs(col("o_orderdate")).as("epoch_ms"),
          Dates.toHuman(Dates.epochMs(col("o_orderdate"))).as("human"),
          Dates.daysBetween(lit("1998-08-01").cast("date"),
            col("o_orderdate")).as("days_old"),
          Dates.toMbps(col("o_totalprice"), lit(300)).as("mbps"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') || '-01T00:00:00.0' AS alert_date,
        |  (epoch_ms(o_orderdate) // 1000) * 1000 AS epoch_ms,
        |  strftime(make_timestamp((epoch_ms(o_orderdate) // 1000) * 1000000), '%Y-%m-%d  %H:%M:%S') AS human,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-08-01') AS days_old,
        |  round(o_totalprice * 8 / (300 * 1000 * 1000), 3) AS mbps
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin)),

    // P5: membership against a 46-value set as a broadcast semi-join
    // (the isin-chain alternative that scales to big skip-lists).
    "q38_broadcast_membership" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .withColumn("version", concat(lit("v"), col("l_suppkey") % 200))
        Relational.broadcastSetFilter(li, "version", BadVersions)
          .groupBy(col("version"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("version"))
      },
      Some(s"""SELECT 'v' || CAST(l_suppkey % 200 AS VARCHAR) AS version,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE 'v' || CAST(l_suppkey % 200 AS VARCHAR) IN
        |  (${BadVersions.mkString("'", "', '", "'")})
        |GROUP BY 1
        |ORDER BY version""".stripMargin))
  )
}
