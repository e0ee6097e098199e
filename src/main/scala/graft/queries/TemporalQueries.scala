package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TemporalJoins

/** q116–q117: the time-travel joins (as-of, point-in-interval) in
  * their shuffle-scalable formulations, gated against oracles that
  * use DuckDB's native ASOF JOIN and a plain theta join respectively
  * — the Spark plans must reproduce the declarative semantics
  * exactly, including unmatched rows and boundary inclusivity.
  */
object TemporalQueries extends QueryPack {

  def defs: Map[String, Q] = Map(

    // Backward as-of: every event joins the latest config version
    // at-or-before it. The version fixture covers all regimes: users
    // with several versions (u%4), users with NONE (u%5=0 → null
    // match), and users whose FIRST version postdates their early
    // events (u%7=0, +10 days → leading nulls). The oracle is
    // DuckDB's native ASOF LEFT JOIN.
    "q116_asof_join" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_millis(ts)").as("t"),
            col("event_type"))
        val versions = ev.select(col("user_id")).distinct()
          .filter(col("user_id") % 5 =!= 0)
          .select(col("user_id"),
            explode(sequence(lit(0L), col("user_id") % 4)).as("j"))
          .select(col("user_id"),
            (lit(1704067200000L) +
              when(col("user_id") % 7 === 0, 864000000L).otherwise(0L) +
              col("j") * 259200000L).as("vt"),
            concat(lit("v"), col("user_id"), lit("-"), col("j")).as("cfg"))
        TemporalJoins.asOfBackward(ev, versions, "user_id", "t", "vt",
            Seq("cfg"))
          .orderBy(col("user_id"), col("t"), col("event_type"))
      },
      Some("""WITH l AS (
        |  SELECT user_id, epoch_ms(ts) AS t, event_type FROM events),
        |u AS (SELECT DISTINCT user_id FROM events),
        |v AS (
        |  SELECT user_id,
        |    1704067200000 +
        |      CASE WHEN user_id % 7 = 0 THEN 864000000 ELSE 0 END +
        |      j * 259200000 AS vt,
        |    'v' || user_id || '-' || j AS cfg
        |  FROM (SELECT user_id,
        |          unnest(generate_series(0, CAST(user_id % 4 AS INT))) AS j
        |        FROM u WHERE user_id % 5 <> 0))
        |SELECT l.user_id, l.t, l.event_type, v.vt AS asof_time, v.cfg
        |FROM l ASOF LEFT JOIN v
        |  ON l.user_id = v.user_id AND l.t >= v.vt
        |ORDER BY l.user_id, l.t, l.event_type""".stripMargin)),

    // Point-in-interval range join via bucketed equi-join (1-day
    // buckets over 0.5–3.5-day intervals): the oracle is the plain
    // theta join — a green hash proves the bucketing drops nothing,
    // duplicates nothing, and honors [start, end) at the boundaries.
    "q117_range_join" -> Q(
      (s, dir) => {
        val pts = Tables.events(s, dir)
          .select((col("user_id") % 25).as("grp"),
            expr("unix_millis(ts)").as("t"), col("event_id"))
        val base = lit(1704067200000L)
        val ivs = Tables.customer(s, dir)
          .filter(col("c_custkey") % 60 === 0)
          .select((col("c_custkey") % 25).as("grp"),
            (base + (col("c_custkey") % 30) * 86400000L).as("iv_start"),
            (base + (col("c_custkey") % 30) * 86400000L +
              ((col("c_custkey") % 7) + 1) * 43200000L).as("iv_end"),
            col("c_custkey").as("iv_id"))
        TemporalJoins.rangeJoinBucketed(pts, ivs, "grp", "t",
            "iv_start", "iv_end", bucketMs = 86400000L)
          .orderBy(col("iv_id"), col("event_id"))
      },
      Some("""WITH p AS (
        |  SELECT user_id % 25 AS grp, epoch_ms(ts) AS t, event_id
        |  FROM events),
        |iv AS (
        |  SELECT c_custkey % 25 AS grp,
        |    1704067200000 + (c_custkey % 30) * 86400000 AS iv_start,
        |    1704067200000 + (c_custkey % 30) * 86400000
        |      + ((c_custkey % 7) + 1) * 43200000 AS iv_end,
        |    c_custkey AS iv_id
        |  FROM customer WHERE c_custkey % 60 = 0)
        |SELECT p.grp, p.t, p.event_id, iv.iv_start, iv.iv_end, iv.iv_id
        |FROM p JOIN iv
        |  ON p.grp = iv.grp AND p.t >= iv.iv_start AND p.t < iv.iv_end
        |ORDER BY iv_id, event_id""".stripMargin)),

    // Interval-overlap join (maintenance windows × incident spans per
    // group): both sides bucket-burst, pairs kept only in the bucket
    // of max(starts) — exactly once, no dedup. The oracle is the
    // plain overlap theta join, so a green hash proves the owner-
    // bucket trick drops and duplicates nothing.
    "q119_interval_overlap" -> Q(
      (s, dir) => {
        val base = lit(1704067200000L)
        val ck = col("c_custkey")
        val a = Tables.customer(s, dir).filter(ck % 40 === 0)
          .select((ck % 10).as("grp"),
            (base + (ck % 23) * 86400000L).as("a_start"),
            (base + (ck % 23) * 86400000L +
              ((ck % 5) + 1) * 129600000L).as("a_end"),
            ck.as("a_id"))
        val ok = col("o_orderkey")
        val b = Tables.orders(s, dir).filter(ok % 200 === 0)
          .select((ok % 10).as("grp"),
            (base + (ok % 20) * 100800000L).as("b_start"),
            (base + (ok % 20) * 100800000L +
              ((ok % 3) + 1) * 172800000L).as("b_end"),
            ok.as("b_id"))
        TemporalJoins.intervalOverlapJoin(a, b, "grp",
            "a_start", "a_end", "b_start", "b_end", bucketMs = 86400000L)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH a AS (
        |  SELECT c_custkey % 10 AS grp,
        |    1704067200000 + (c_custkey % 23) * 86400000 AS a_start,
        |    1704067200000 + (c_custkey % 23) * 86400000
        |      + ((c_custkey % 5) + 1) * 129600000 AS a_end,
        |    c_custkey AS a_id
        |  FROM customer WHERE c_custkey % 40 = 0),
        |b AS (
        |  SELECT o_orderkey % 10 AS grp,
        |    1704067200000 + (o_orderkey % 20) * 100800000 AS b_start,
        |    1704067200000 + (o_orderkey % 20) * 100800000
        |      + ((o_orderkey % 3) + 1) * 172800000 AS b_end,
        |    o_orderkey AS b_id
        |  FROM orders WHERE o_orderkey % 200 = 0)
        |SELECT a.grp, a.a_start, a.a_end, a.a_id, b.b_start, b.b_end, b.b_id
        |FROM a JOIN b
        |  ON a.grp = b.grp AND a.a_start < b.b_end AND b.b_start < a.a_end
        |ORDER BY a_id, b_id""".stripMargin)),

    // Z-order clustering key: 10-bit Morton interleave of two
    // synthetic dimensions, the sort key of a data-skipping layout.
    // The oracle recomputes the interleave per bit position from the
    // same shift/mask arithmetic — bit-exact across engines.
    "q118_zorder_key" -> Q(
      (s, dir) => {
        val x = col("c_custkey") % 1024
        val y = (col("c_nationkey") * 41) % 1024
        Tables.customer(s, dir)
          .select(col("c_custkey"), x.as("x"), y.as("y"),
            graft.functions.ZOrder.zKey(x, y, 10).as("zkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH d AS (
        |  SELECT c_custkey, c_custkey % 1024 AS x,
        |         (c_nationkey * 41) % 1024 AS y
        |  FROM customer),
        |bits AS (SELECT unnest(generate_series(0, 9)) AS i)
        |SELECT c_custkey, x, y,
        |  CAST(sum((((x >> i) & 1) << (2 * i)) +
        |           (((y >> i) & 1) << (2 * i + 1))) AS BIGINT) AS zkey
        |FROM d CROSS JOIN bits
        |GROUP BY c_custkey, x, y
        |ORDER BY c_custkey""".stripMargin)),

    // Z-order + zonemap END-TO-END: shard rows by z-key range, build
    // per-shard min/max stats for BOTH dimensions, and prune a 2-D
    // box predicate — the demonstration that Morton clustering makes
    // both axes skippable at once (sharding by x alone leaves y
    // unprunable). can_skip is the planner-side verdict per shard.
    "q159_zorder_pruning" -> Q(
      (s, dir) => {
        import graft.operators.Corpus
        val x = col("c_custkey") % 1024
        val y = (col("c_nationkey") * 41) % 1024
        val keyed = Tables.customer(s, dir)
          .select(x.as("x"), y.as("y"),
            graft.functions.ZOrder.zKey(x, y, 10).as("zkey"))
        val zm = Corpus.zonemap(keyed, expr("zkey div 65536"),
          Seq("x", "y"))
        zm.withColumn("can_skip",
            col("max_x") < 100 || col("min_x") > 300 ||
            col("max_y") < 200 || col("min_y") > 500)
          .orderBy(col("shard"))
      },
      Some("""WITH d AS (
        |  SELECT c_custkey, c_custkey % 1024 AS x,
        |         (c_nationkey * 41) % 1024 AS y
        |  FROM customer),
        |bits AS (SELECT unnest(generate_series(0, 9)) AS i),
        |z AS (SELECT c_custkey, x, y,
        |    CAST(sum((((x >> i) & 1) << (2 * i)) +
        |             (((y >> i) & 1) << (2 * i + 1))) AS BIGINT) AS zkey
        |  FROM d CROSS JOIN bits
        |  GROUP BY c_custkey, x, y)
        |SELECT zkey // 65536 AS shard, count(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y,
        |  (max(x) < 100 OR min(x) > 300 OR max(y) < 200 OR min(y) > 500)
        |    AS can_skip
        |FROM z
        |GROUP BY 1
        |ORDER BY shard""".stripMargin)),

    // Point-in-time enrichment against an SCD2 dimension (the read
    // side of q217/q218): every order attaches the customer-segment
    // version live at its order date. History: %3 keys carry a LEGACY
    // era [1992-01-01, 1995-06-15) before the current segment; other
    // keys' history only BEGINS 1995-06-15, so their earlier orders
    // legitimately enrich to NULL — the containment check, not just
    // nearest-predecessor. Rides the as-of union-merge: one keyed
    // shuffle, no versions-per-key amplification.
    "q220_pit_enrich" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        def t(x: String) = to_timestamp(lit(x))
        val history = c.select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("seg"),
            t("1995-06-15 00:00:00").as("valid_from"),
            lit(null).cast("timestamp").as("valid_to"))
          .unionByName(c.filter(col("c_custkey") % 3 === 0)
            .select(col("c_custkey").as("o_custkey"),
              lit("LEGACY").as("seg"),
              t("1992-01-01 00:00:00").as("valid_from"),
              t("1995-06-15 00:00:00").as("valid_to")))
        val facts = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("timestamp").as("o_ts"))
        graft.operators.Scd2.pitLookup(facts, history,
            "o_custkey", "o_ts", Seq("seg"))
          .select(col("o_orderkey"), col("o_custkey"), col("seg"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderdate >= DATE '1995-06-15' THEN c_mktsegment
        |       WHEN o_custkey % 3 = 0 THEN 'LEGACY'
        |       ELSE NULL END AS seg
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin))
  )
}
