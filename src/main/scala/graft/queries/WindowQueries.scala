package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Windows

/** q11–q17: dedup, top-k, order statistics, chunked scoring, state
  * transitions, run-length encoding, sessionization (SURVEY §2.6, A11,
  * A15, A16, K2).
  */
object WindowQueries extends QueryPack {

  def defs: Map[String, Q] = Map(
    // K2/dedup: unique-key dedup (Events' INSERT IGNORE semantics).
    "q11_dedup_distinct" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
        .distinct()
        .orderBy(col("user_id"), col("event_type"), col("day")),
      Some("""SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
        |FROM events
        |ORDER BY user_id, event_type, day""".stripMargin)),

    // A11: top-k rows per group via row_number window.
    "q12_topk_window" -> Q(
      (s, dir) => Windows.topKPerGroup(Tables.orders(s, dir),
          "o_custkey", "o_totalprice", "o_orderkey", 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"),
                col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn")),
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin)),

    // A11: 1st/5th/10th highest value per group (order statistics) —
    // the windowed form: l_suppkey groups grow with the data, so the
    // collect_list variant (kept for bounded groups) is a scale trap
    // here (VERDICT r1).
    "q13_order_stats" -> Q(
      (s, dir) => Windows.orderStatsScalable(Tables.lineitem(s, dir),
        "l_suppkey", "l_extendedprice", Seq(1, 5, 10))
        .orderBy(col("l_suppkey")),
      Some("""SELECT l_suppkey,
        |  (list(l_extendedprice ORDER BY l_extendedprice DESC))[1] AS highest_1,
        |  (list(l_extendedprice ORDER BY l_extendedprice DESC))[5] AS highest_5,
        |  (list(l_extendedprice ORDER BY l_extendedprice DESC))[10] AS highest_10
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin)),

    // A16: fixed-size chunk scoring, min per key (lowest_qoe shape).
    "q14_chunked_min" -> Q(
      (s, dir) => Windows.chunkedMinScore(Tables.events(s, dir),
        "user_id", "ts", "event_id",
        col("event_type") === "error", col("event_type") === "purchase", 8)
        .orderBy(col("user_id")),
      Some("""SELECT user_id, min(chunk_score) AS lowest_score, count(*) AS n_chunks
        |FROM (
        |  SELECT user_id,
        |    (count(CASE WHEN event_type='error' THEN 1 END)*10
        |     + count(CASE WHEN event_type='purchase' THEN 1 END)*5) / 8.0 AS chunk_score
        |  FROM (SELECT user_id, event_type,
        |          (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 8 AS chunk_id
        |        FROM events) c
        |  GROUP BY user_id, chunk_id) s
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // A15 (transition side): brownout/blackout-style prev→curr counters.
    "q15_transitions" -> Q(
      (s, dir) => Windows.transitionCounts(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type", Seq(
          ("n_view_to_error", _ === "view", _ === "error"),
          ("n_click_to_purchase", _ === "click", _ === "purchase")))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
        |  count(CASE WHEN prev_state='view' AND event_type='error' THEN 1 END) AS n_view_to_error,
        |  count(CASE WHEN prev_state='click' AND event_type='purchase' THEN 1 END) AS n_click_to_purchase
        |FROM (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
        |      FROM events) t
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // A15 (duration side): run-length encoding via segment-id trick.
    "q16_run_lengths" -> Q(
      (s, dir) => Windows.runLengths(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"))
        .orderBy(col("user_id")),
      Some("""WITH a AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_type,
        |         sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM a),
        |r AS (SELECT user_id, run_id, count(*) AS run_len FROM b GROUP BY user_id, run_id)
        |SELECT user_id, count(*) AS n_runs, max(run_len) AS max_run
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // §2.8: gap-based sessionization (30-minute inactivity break).
    "q17_sessionize" -> Q(
      (s, dir) => Windows.sessionize(Tables.events(s, dir),
          "user_id", "ts", "event_id", 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("sess_len"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), max(col("sess_len")).as("max_sess_len"))
        .orderBy(col("user_id")),
      Some("""WITH a AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id,
        |         sum(CASE WHEN prev_ts IS NULL
        |                       OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM a),
        |s AS (SELECT user_id, session_id, count(*) AS sess_len FROM b GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions, max(sess_len) AS max_sess_len
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Rate-drift monitor: per (event_type, day) volume against the
    // trailing 7 OBSERVATIONS (row frame — gap days are absent, so
    // the baseline is the last 7 active days). Spike = today more
    // than double the trailing mean, kept integer-exact as
    // n·t_days > 2·t_sum. The pipeline-health query over any
    // event-shaped table.
    "q157_event_drift" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-7, -1)
        daily
          .withColumn("t_days", count(col("n")).over(w))
          .withColumn("t_sum", coalesce(sum(col("n")).over(w), lit(0L)))
          .withColumn("spike",
            col("t_days") > 0 && col("n") * col("t_days") > col("t_sum") * 2)
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, n,
        |    count(n) OVER w AS t_days,
        |    coalesce(sum(n) OVER w, 0) AS t_sum
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, CAST(t_days AS BIGINT) AS t_days,
        |  CAST(t_sum AS BIGINT) AS t_sum,
        |  (t_days > 0 AND n * t_days > t_sum * 2) AS spike
        |FROM t
        |ORDER BY event_type, day""".stripMargin)),

    // TRUE debounce (kept = arrives > 6 h after the previous KEPT
    // event): a sequential recurrence no window frame expresses, run
    // as a per-key ordered integer fold and replayed in the oracle
    // with the identical list_reduce — the q215 fold discipline.
    // Oracle caveat (empirically pinned): DuckDB 1.0.0's list_reduce
    // mis-executes batches when the lambda returns the ACCUMULATOR
    // from the ELSE branch (off-by-one on ~1/4 of rows, correct
    // row-at-a-time) — the acc-returning branch must be the THEN arm,
    // exactly how the (green) q215 encode oracle is shaped.
    "q254_debounce" -> Q(
      (s, dir) => Windows.debounceCounts(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "ts", quietMs = 21600000L)
        .orderBy(col("user_id")),
      Some("""WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms
        |  FROM events WHERE user_id IS NOT NULL),
        |a AS (
        |  SELECT user_id, count(*) AS n_events,
        |    list_sort(list(ms)) AS msl
        |  FROM e GROUP BY 1),
        |f AS (
        |  SELECT user_id, n_events,
        |    list_reduce(
        |      [{'last': CAST(-4611686018427387904 AS BIGINT),
        |        'kept': CAST(0 AS BIGINT)}] ||
        |        list_transform(msl, x ->
        |          {'last': x, 'kept': CAST(0 AS BIGINT)}),
        |      (acc, x) -> CASE
        |        WHEN x.last - acc.last <= 21600000 THEN acc
        |        ELSE {'last': x.last, 'kept': acc.kept + 1}
        |        END) AS st
        |  FROM a)
        |SELECT user_id, n_events, st.kept AS n_kept,
        |  st.last AS last_kept_ms
        |FROM f
        |ORDER BY user_id""".stripMargin))
  )
}
