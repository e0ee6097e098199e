package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Qoe

/** q23–q24: reference-exact QoE outage semantics (SURVEY A15/A16,
  * `CalculateBrownouts/Blackouts`, `lowest_qoe`) over the events table,
  * with event types mapped to the reference's 0–4 link-state alphabet.
  *
  * Both the declarative run-length plan (q23) and the
  * `flatMapGroups` literal state machine (q24) are registered against
  * the SAME oracle formulation — the correctness gate itself checks
  * the two implementations agree with the loop semantics.
  */
object QoeQueries extends QueryPack {

  private def withState(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).withColumn("state",
      when(col("event_type") === "view", 4)
        .when(col("event_type") === "signup", 3)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "error", 0)
        .otherwise(1))

  private val stateSql =
    """CASE event_type WHEN 'view' THEN 4 WHEN 'signup' THEN 3
      |     WHEN 'click' THEN 2 WHEN 'error' THEN 0 ELSE 1 END""".stripMargin

  private def runsCte =
    s"""WITH s AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
       |         $stateSql AS state
       |  FROM events),
       |a AS (
       |  SELECT *, lag(state) OVER w AS prev_state,
       |         CASE WHEN lag(state) OVER w IS NULL
       |                OR lag(state) OVER w <> state THEN 1 ELSE 0 END AS is_start
       |  FROM s WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)),
       |b AS (
       |  SELECT *, sum(is_start) OVER (PARTITION BY user_id, day
       |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
       |  FROM a),
       |r AS (
       |  SELECT user_id, day, run_id,
       |         first(state ORDER BY ts, event_id) AS run_state,
       |         first(prev_state ORDER BY ts, event_id) AS pred_state,
       |         count(*) AS run_len
       |  FROM b GROUP BY user_id, day, run_id),
       |o AS (
       |  SELECT user_id, day,
       |    CAST(count(CASE WHEN run_state=2 AND pred_state=4 THEN 1 END) AS INT) AS n_brownouts,
       |    round(coalesce(sum(CASE WHEN run_state=2 AND pred_state=4 THEN run_len END), 0) * 7.12 / 60, 3) AS brownout_min,
       |    CAST(count(CASE WHEN run_state=0 AND pred_state IN (2,3,4) THEN 1 END) AS INT) AS n_blackouts,
       |    round(coalesce(sum(CASE WHEN run_state=0 AND pred_state IN (2,3,4) THEN run_len END), 0) * 7.12 / 60, 3) AS blackout_min
       |  FROM r GROUP BY user_id, day)""".stripMargin

  def defs: Map[String, Q] = Map(
    // A15 declarative: one window + two groupBys, codegen end to end.
    "q23_qoe_outages" -> Q(
      (s, dir) => Qoe.dailyOutagesDF(withState(s, dir), "user_id",
          to_date(col("ts")), "ts", "event_id", "state")
        .orderBy(col("user_id"), col("day")),
      Some(s"""$runsCte
        |SELECT user_id, day, n_brownouts, brownout_min, n_blackouts, blackout_min
        |FROM o
        |ORDER BY user_id, day""".stripMargin)),

    // A15+A16 literal loop via groupByKey.flatMapGroups, plus the
    // chunked lowest_qoe score.
    "q24_qoe_exact" -> Q(
      (s, dir) => Qoe.outagesByGroup(withState(s, dir), "user_id",
          to_date(col("ts")), "ts", "event_id", "state")
        .withColumnRenamed("group_key", "user_id")
        .orderBy(col("user_id"), col("day")),
      Some(s"""$runsCte,
        |c AS (
        |  SELECT user_id, day, state,
        |         (row_number() OVER (PARTITION BY user_id, day
        |            ORDER BY ts, event_id) - 1) // 8 AS chunk_id
        |  FROM s),
        |l AS (
        |  SELECT user_id, day, chunk_id,
        |    (count(CASE WHEN state=4 THEN 1 END)*10
        |     + count(CASE WHEN state=3 THEN 1 END)*5) / 8.0 AS score
        |  FROM c GROUP BY 1, 2, 3),
        |lo AS (SELECT user_id, day, min(score) AS lowest_score FROM l GROUP BY 1, 2)
        |SELECT o.user_id, o.day, o.n_brownouts, o.brownout_min,
        |       o.n_blackouts, o.blackout_min, lo.lowest_score
        |FROM o JOIN lo ON o.user_id = lo.user_id AND o.day = lo.day
        |ORDER BY o.user_id, o.day""".stripMargin))
  )
}
