package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Analytics, Classifier, Corpus, DataQuality, Eval, Privacy}

/** Classic BI readout shapes over the fact tables — rollup/cube
  * subtotals, pivot, calendar gap-fill, cohort retention, ordered
  * funnel, rank metrics (q190–q194, q201, q207), plus the
  * experimentation pair: linear multi-touch attribution (q225) and
  * deterministic A/B lift (q226) — the consumers the reference's
  * gold tables feed.
  */
object AnalyticsQueries extends QueryPack {

  def defs: Map[String, Q] = Map(

    // ROLLUP: leaves + per-priority subtotals + grand total in ONE
    // Expand+agg pass (vs 3 unioned groupBys = 3 fact scans).
    // grouping_id disambiguates levels; (keys, gid) is the total
    // order key.
    "q190_rollup" -> Q(
      (s, dir) => Analytics.rollupSummary(
          Tables.orders(s, dir), "o_orderpriority", "o_orderstatus",
          col("o_totalprice"))
        .withColumn("gid", col("gid").cast("long"))
        .orderBy(col("o_orderpriority"), col("o_orderstatus"), col("gid")),
      Some("""SELECT coalesce(o_orderpriority, 'total') AS o_orderpriority,
        |  coalesce(o_orderstatus, 'total') AS o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
        |    AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority, o_orderstatus, gid""".stripMargin)),

    // Pivot long→wide with a PINNED value list (no driver-side
    // distinct scan to plan the schema); absent combos surface as 0.
    "q191_pivot" -> Q(
      (s, dir) => Analytics.pivotCounts(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // Calendar gap-fill + forward fill: dense (event_type × day)
    // grid over the global span; gap days carry the last observed
    // daily count. The oracle replays the same segment-carry
    // formulation (running count of observations → max per segment).
    "q192_gap_fill" -> Q(
      (s, dir) => Analytics.gapFillDaily(
          Tables.events(s, dir), "event_type", "ts")
        .orderBy(col("event_type"), col("day")),
      Some("""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        |g AS (
        |  SELECT t.event_type,
        |    CAST(unnest(generate_series(CAST(s.lo AS TIMESTAMP),
        |      CAST(s.hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM d) t, s),
        |j AS (
        |  SELECT g.event_type, g.day, d.n
        |  FROM g LEFT JOIN d ON g.event_type = d.event_type
        |                    AND g.day = d.day),
        |f AS (
        |  SELECT event_type, day, n,
        |    count(n) OVER (PARTITION BY event_type ORDER BY day) AS seg
        |  FROM j)
        |SELECT event_type, day,
        |  coalesce(max(n) OVER (PARTITION BY event_type, seg), 0)
        |    AS n_filled,
        |  n IS NULL AS was_gap
        |FROM f
        |ORDER BY event_type, day""".stripMargin)),

    // Cohort retention: cohort = first-activity ISO week; per
    // (cohort, week offset k) the count of members active k weeks
    // later. Two user-keyed aggs + one user-key join; output is
    // cohorts × offsets.
    "q193_cohort_retention" -> Q(
      (s, dir) => Analytics.cohortRetention(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset")),
      Some("""WITH w AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events WHERE user_id IS NOT NULL),
        |c AS (SELECT user_id, min(week) AS cohort_week
        |      FROM w GROUP BY user_id)
        |SELECT c.cohort_week,
        |  CAST(datediff('day', c.cohort_week, w.week) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(*) AS n_active
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // Ordered funnel view → click → purchase: stage k counts only
    // events strictly after the user's stage-(k-1) reach time. Each
    // stage is a key-partitioned filter+join+min — no per-user event
    // collection.
    "q194_funnel" -> Q(
      (s, dir) => Analytics.funnel(
        Tables.events(s, dir).filter(col("user_id").isNotNull),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")),
      Some("""WITH e AS (
        |  SELECT user_id, event_type, ts FROM events
        |  WHERE user_id IS NOT NULL),
        |r1 AS (SELECT user_id, min(ts) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |r2 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM e JOIN r1 ON e.user_id = r1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > r1.t GROUP BY 1),
        |r3 AS (SELECT e.user_id, min(e.ts) AS t
        |       FROM e JOIN r2 ON e.user_id = r2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > r2.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage_idx, 'view' AS stage,
        |    (SELECT count(*) FROM r1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM r2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM r3))
        |ORDER BY stage_idx""".stripMargin)),

    // Linear multi-touch attribution: every view/click in the 24 h
    // before a purchase shares that conversion's credit equally, in
    // EXACT integer ppm (remainder to the most recent touch) so each
    // converted purchase contributes exactly 1 000 000 and the
    // per-type rollup reconciles. User-keyed join + conv-bounded
    // windows — never all-pairs.
    "q225_attribution" -> Q(
      (s, dir) => Analytics.linearAttribution(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "event_type", "ts", "event_id",
          touchTypes = Seq("view", "click"), convType = "purchase",
          lookbackHours = 24)
        .orderBy(col("touch_type")),
      Some("""WITH t AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
        |    ts AS tts
        |  FROM events
        |  WHERE event_type IN ('view', 'click') AND user_id IS NOT NULL),
        |c AS (
        |  SELECT user_id, event_id AS conv_id, ts AS cts
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |j AS (
        |  SELECT t.touch_id, t.touch_type, t.tts, c.conv_id
        |  FROM t JOIN c ON t.user_id = c.user_id
        |   AND t.tts <= c.cts AND t.tts > c.cts - INTERVAL 24 HOURS),
        |w AS (
        |  SELECT touch_type, conv_id,
        |    count(*) OVER (PARTITION BY conv_id) AS n,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY tts DESC, touch_id DESC) AS rn
        |  FROM j)
        |SELECT touch_type, count(*) AS n_touches,
        |  count(DISTINCT conv_id) AS n_conversions,
        |  CAST(sum(1000000 // n
        |    + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END) AS BIGINT)
        |    AS credit_ppm
        |FROM w GROUP BY touch_type
        |ORDER BY touch_type""".stripMargin)),

    // A/B readout with stateless deterministic assignment: variant =
    // 60-bit md5(user) mod 2 (no assignment table — any engine
    // recomputes the bucket), conversion = any purchase event,
    // rate in exact integer ppm.
    "q226_ab_lift" -> Q(
      (s, dir) => Analytics.abLift(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "event_type", convType = "purchase", variants = 2)
        .orderBy(col("variant")),
      Some("""WITH u AS (
        |  SELECT user_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 2 AS variant,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT variant, count(*) AS n_users,
        |  CAST(sum(conv) AS BIGINT) AS n_converted,
        |  (1000000 * CAST(sum(conv) AS BIGINT)) // count(*) AS conv_ppm
        |FROM u GROUP BY variant
        |ORDER BY variant""".stripMargin)),

    // User-journey path mining: the most common 3-step event
    // sequences across all users — per-user (ts, id)-ordered lag
    // windows form the trigram paths (one user-keyed sort, the q15
    // transition discipline extended to length 3), then one global
    // count + top-10 by (count desc, path). The journey readout that
    // motivates funnel definitions, as data instead of opinion.
    "q241_journey_paths" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val paths = Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("e1", lag(col("event_type"), 2).over(w))
          .withColumn("e2", lag(col("event_type"), 1).over(w))
          .filter(col("e1").isNotNull)
          .select(concat_ws(">", col("e1"), col("e2"),
            col("event_type")).as("path"))
        val ranked = paths.groupBy(col("path"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("path"))).cast("long"))
          .filter(col("rank") <= 10)
        ranked.orderBy(col("rank"))
      },
      Some("""WITH t AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2
        |  FROM events WHERE user_id IS NOT NULL),
        |p AS (SELECT e1 || '>' || e2 || '>' || event_type AS path
        |      FROM t WHERE e1 IS NOT NULL),
        |r AS (SELECT path, count(*) AS n,
        |    row_number() OVER (ORDER BY count(*) DESC, path) AS rank
        |  FROM p GROUP BY path)
        |SELECT path, n, rank FROM r WHERE rank <= 10
        |ORDER BY rank""".stripMargin)),

    // Relative standing per order within its priority class:
    // percent_rank / cume_dist / price quartile. The unique
    // (value, key) order makes ntile's tie assignment deterministic.
    "q201_rank_metrics" -> Q(
      (s, dir) => Analytics.rankMetrics(
          Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
          "o_orderkey", 4)
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS bucket
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)),

    // Semi-structured extraction: the events.props JSON column
    // parsed IN the scan projection (get_json_object is codegen'd —
    // from_json with a pinned schema is the struct-typed alternative)
    // and aggregated per event_type. At 100 TB the parse rides the
    // scan: no UDF, no shuffle beyond the bounded group agg.
    "q204_json_extract" -> Q(
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables.events(s, dir)
          .select(col("event_type"), k.as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"),
            countDistinct(col("k")).as("n_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(count(DISTINCT CAST(json_extract(props, '$.k')
        |    AS BIGINT)) AS BIGINT) AS n_k
        |FROM events GROUP BY 1
        |ORDER BY event_type""".stripMargin)),

    // CUBE: q190's rollup without the hierarchy assumption — all
    // four grouping sets (leaves, both margins, grand total) in the
    // same single Expand+agg pass.
    "q207_cube" -> Q(
      (s, dir) => Analytics.cubeSummary(
          Tables.orders(s, dir), "o_orderpriority", "o_orderstatus",
          col("o_totalprice"))
        .withColumn("gid", col("gid").cast("long"))
        .orderBy(col("o_orderpriority"), col("o_orderstatus"), col("gid")),
      Some("""SELECT coalesce(o_orderpriority, 'total') AS o_orderpriority,
        |  coalesce(o_orderstatus, 'total') AS o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
        |    AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority, o_orderstatus, gid""".stripMargin)),

    // Session-basket co-occurrence lift: 30-min gap sessions are the
    // baskets (q62's rule via Windows.sessionize), distinct
    // event_types the items, and every unordered pair reads support
    // plus lift = P(a,b)/(P(a)P(b)) in exact cross-multiplied ppm —
    // association mining at the pair grain, the "users who did A in a
    // session also did B" readout. All-integer gate.
    "q244_session_lift" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
        val baskets = graft.operators.Windows
          .sessionize(ev, "user_id", "ts", "event_id", 1800L)
          .select(concat_ws("#", col("user_id"), col("session_id"))
            .as("basket"), col("event_type").as("item"))
        graft.operators.Graph
          .cooccurrenceLift(baskets, "basket", "item", minSupport = 2L)
          .orderBy(col("item_a"), col("item_b"))
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |  FROM events WHERE user_id IS NOT NULL),
        |a AS (
        |  SELECT user_id, event_id, event_type, ms,
        |    lag(ms) OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id) AS prev
        |  FROM e),
        |b AS (
        |  SELECT user_id, event_type,
        |    sum(CASE WHEN prev IS NULL OR ms - prev > 1800000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM a),
        |bi AS (
        |  SELECT DISTINCT user_id || '#' || sid AS basket,
        |    event_type AS item
        |  FROM b),
        |n AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
        |sz AS (SELECT item, count(*) AS nn FROM bi GROUP BY 1),
        |p AS (
        |  SELECT x.item AS item_a, y.item AS item_b, count(*) AS n_ab
        |  FROM bi x JOIN bi y
        |    ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, n_ab, sa.nn AS n_a, sb.nn AS n_b,
        |  n_baskets,
        |  (1000000 * n_ab * n_baskets) // (sa.nn * sb.nn) AS lift_ppm
        |FROM p
        |JOIN sz sa ON sa.item = item_a
        |JOIN sz sb ON sb.item = item_b
        |CROSS JOIN n
        |WHERE n_ab >= 2
        |ORDER BY item_a, item_b""".stripMargin)),

    // Conversion-window funnel view → click → purchase, each stage
    // within 7 days of the previous reach: per-user nullable
    // millisecond reach times — q194's funnel with the window
    // semantics a product team actually asks for. All-integer gate.
    "q263_funnel_windowed" -> Q(
      (s, dir) => Analytics.funnelWindowed(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), windowMs = 604800000L)
        .orderBy(col("user_id")),
      Some("""WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms
        |  FROM events WHERE user_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(ms) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ms) AS t2
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND ms > t1
        |         AND ms <= t1 + 604800000
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ms) AS t3
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND ms > t2
        |         AND ms <= t2 + 604800000
        |       GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin)),

    // Temporal-split leakage audit: events split train (< Mar 1) /
    // eval (≥ Mar 1); a user STRADDLES when their last train event
    // and first eval event both fall inside the 7-day embargo around
    // the boundary — the rows an ML practitioner must drop before
    // claiming the eval set is out-of-time. One user-keyed
    // conditional agg; all integers.
    "q264_split_leakage" -> Q(
      (s, dir) => {
        val boundaryMs = 1709251200000L // 2024-03-01T00:00Z
        val embargoMs = 604800000L
        Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .select(col("user_id"), unix_millis(col("ts")).as("ms"))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ms") < boundaryMs, 1L).otherwise(0L))
              .as("n_train"),
            sum(when(col("ms") >= boundaryMs, 1L).otherwise(0L))
              .as("n_eval"),
            max(when(col("ms") < boundaryMs, col("ms")))
              .as("last_train_ms"),
            min(when(col("ms") >= boundaryMs, col("ms")))
              .as("first_eval_ms"))
          .withColumn("straddles",
            coalesce(col("last_train_ms") >= boundaryMs - embargoMs &&
              col("first_eval_ms") < boundaryMs + embargoMs,
              lit(false)))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        |  CAST(sum(CASE WHEN epoch_ms(ts) < 1709251200000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN epoch_ms(ts) >= 1709251200000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
        |  max(CASE WHEN epoch_ms(ts) < 1709251200000
        |    THEN epoch_ms(ts) END) AS last_train_ms,
        |  min(CASE WHEN epoch_ms(ts) >= 1709251200000
        |    THEN epoch_ms(ts) END) AS first_eval_ms,
        |  coalesce(
        |    max(CASE WHEN epoch_ms(ts) < 1709251200000
        |      THEN epoch_ms(ts) END) >= 1709251200000 - 604800000
        |    AND
        |    min(CASE WHEN epoch_ms(ts) >= 1709251200000
        |      THEN epoch_ms(ts) END) < 1709251200000 + 604800000,
        |    false) AS straddles
        |FROM events
        |WHERE user_id IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // EXACT AUC-ROC by the Mann-Whitney rank-sum identity, doubled to
    // stay integer under ties (tie group's 2·avg rank = min+max):
    // how well does document length separate English from the rest?
    // One global sort; the AUC double is one IEEE division chain on
    // exact integers.
    "q273_auc_exact" -> Q(
      (s, dir) => Analytics.aucExact(
          Tables.documents(s, dir)
            .select(col("n_chars"), (col("lang") === "en").as("y")),
          "n_chars", "y"),
      Some("""WITH b AS (
        |  SELECT n_chars AS sc, lang = 'en' AS y FROM documents),
        |r AS (
        |  SELECT sc, y,
        |    CAST(row_number() OVER (ORDER BY sc) AS BIGINT) AS rn
        |  FROM b),
        |t AS (
        |  SELECT y,
        |    min(rn) OVER (PARTITION BY sc) +
        |      max(rn) OVER (PARTITION BY sc) AS r2
        |  FROM r),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_neg,
        |    CAST(sum(CASE WHEN y THEN r2 ELSE 0 END) AS BIGINT)
        |      AS rs2
        |  FROM t)
        |SELECT n_pos, n_neg, rs2 - n_pos * (n_pos + 1) AS u2,
        |  CAST(rs2 - n_pos * (n_pos + 1) AS DOUBLE) /
        |    (2.0 * n_pos * n_neg) AS auc
        |FROM a""".stripMargin)),

    // k-anonymity / l-diversity release audit: QI = (nation,
    // segment), sensitive = account-balance band. One QI-keyed
    // partial agg — the audit rides a single scan; output is the QI
    // grid, not the row count. floor(x/1000) is IEEE-identical in
    // both engines (double divide then floor), so the bands hash-gate.
    "q283_k_anonymity" -> Q(
      (s, dir) => Privacy.kAnonymityAudit(
          Tables.customer(s, dir), Seq("c_nationkey", "c_mktsegment"),
          floor(col("c_acctbal") / 1000), k = 8, l = 3)
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
      Some("""SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |    AS n_sensitive,
        |  count(*) >= 8 AS k_anon,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3
        |    AS l_diverse
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // k-anonymity by GLOBAL RECODING (Samarati full-domain
    // generalization): the balance band generalizes up a ×10 divisor
    // hierarchy until EVERY (segment, band) group reaches k=10 — one
    // rule for the whole release, cell suppression (q283's follow-up)
    // only as the fallback level. All levels audited in one exploded
    // pass; the chosen level itself is part of the gate.
    "q494_k_anon_generalize" -> Q(
      (s, dir) => {
        val base = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"),
            (floor(col("c_acctbal") / 100) + 100).cast("long").as("band"))
        Privacy.generalizeToK(base, Seq("c_mktsegment"), "band",
            Seq(1L, 10L, 100L), k = 10)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("gen_band"), col("gen_level").cast("long").as("gen_level"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH base AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 100) + 100 AS BIGINT) AS band
        |  FROM customer),
        |lv(lev, dv) AS (VALUES (0, 1), (1, 10), (2, 100)),
        |g AS (SELECT lv.lev, lv.dv, c_mktsegment, band // lv.dv AS gv,
        |    count(*) AS n
        |  FROM base, lv GROUP BY 1, 2, 3, 4),
        |mn AS (SELECT lev, min(n) AS min_n FROM g GROUP BY 1),
        |chv AS (SELECT coalesce(
        |    (SELECT min(lev) FROM mn WHERE min_n >= 10), 3) AS lev)
        |SELECT b.c_custkey, b.c_mktsegment,
        |  CASE WHEN chv.lev = 3 THEN CAST(NULL AS BIGINT)
        |       ELSE b.band // (CASE chv.lev WHEN 0 THEN 1
        |                      WHEN 1 THEN 10 ELSE 100 END)
        |  END AS gen_band,
        |  CAST(chv.lev AS BIGINT) AS gen_level
        |FROM base b, chv
        |ORDER BY b.c_custkey""".stripMargin)),

    // Deequ-style constraint suite: six expectations over orders in
    // ONE aggregation pass (one scan however many checks ride it).
    // Ratios are integral ppm (count·10^6 div total) — no IEEE
    // division anywhere in the gate. The price-floor check is
    // deliberately strict enough to FAIL so both verdict polarities
    // are exercised.
    "q284_dq_checks" -> Q(
      (s, dir) => DataQuality.checkAll(
        Tables.orders(s, dir),
        Seq(
          DataQuality.Check("custkey_complete",
            DataQuality.completeness(col("o_custkey")), 1000000L),
          DataQuality.Check("orderkey_unique",
            DataQuality.uniqueRatio(col("o_orderkey")), 1000000L),
          DataQuality.Check("price_nonneg",
            DataQuality.satisfiesRatio(col("o_totalprice") >= 0), 1000000L),
          DataQuality.Check("status_domain",
            DataQuality.satisfiesRatio(
              col("o_orderstatus").isin("O", "F", "P")), 1000000L),
          DataQuality.Check("priority_domain",
            DataQuality.satisfiesRatio(substring(col("o_orderpriority"), 1, 1)
              .isin("1", "2", "3", "4", "5")), 1000000L),
          DataQuality.Check("price_floor_1k",
            DataQuality.satisfiesRatio(col("o_totalprice") >= 1000), 900000L))),
      Some("""WITH a AS (
        |  SELECT count(o_custkey) AS m0,
        |    count(DISTINCT o_orderkey) AS m1,
        |    count(CASE WHEN o_totalprice >= 0 THEN 1 END) AS m2,
        |    count(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)
        |      AS m3,
        |    count(CASE WHEN substring(o_orderpriority, 1, 1)
        |      IN ('1','2','3','4','5') THEN 1 END) AS m4,
        |    count(CASE WHEN o_totalprice >= 1000 THEN 1 END) AS m5,
        |    greatest(count(*), 1) AS t
        |  FROM orders)
        |SELECT check_idx, constraint_name, metric_ppm,
        |  metric_ppm >= min_ppm AS pass
        |FROM (
        |  SELECT 0 AS check_idx, 'custkey_complete' AS constraint_name,
        |    m0 * 1000000 // t AS metric_ppm, 1000000 AS min_ppm FROM a
        |  UNION ALL SELECT 1, 'orderkey_unique', m1 * 1000000 // t,
        |    1000000 FROM a
        |  UNION ALL SELECT 2, 'price_nonneg', m2 * 1000000 // t,
        |    1000000 FROM a
        |  UNION ALL SELECT 3, 'status_domain', m3 * 1000000 // t,
        |    1000000 FROM a
        |  UNION ALL SELECT 4, 'priority_domain', m4 * 1000000 // t,
        |    1000000 FROM a
        |  UNION ALL SELECT 5, 'price_floor_1k', m5 * 1000000 // t,
        |    900000 FROM a)
        |ORDER BY check_idx""".stripMargin)),

    // Benford first-digit audit of order totals: observed vs the
    // pinned log₁₀(1+1/d) ppm expectations (literals — no log in
    // either plan), per-digit deviation and the MAD rollup, all
    // exact integers. First digit via the decimal string of
    // ⌊amount⌋ — integer-to-string is engine-unambiguous, unlike
    // float formatting or a pow/log chain.
    "q296_benford" -> Q(
      (s, dir) => Analytics.benfordAudit(
          Tables.orders(s, dir), col("o_totalprice"))
        .orderBy(col("digit")),
      Some("""WITH v AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE floor(o_totalprice) >= 1),
        |d AS (SELECT digit, count(*) AS n FROM v GROUP BY 1),
        |g AS (SELECT unnest(generate_series(1, 9)) AS digit),
        |e AS (SELECT unnest([301029, 176091, 124938, 96910, 79181,
        |    66946, 57991, 51152, 45757]) AS exp_ppm,
        |  unnest(generate_series(1, 9)) AS digit),
        |j AS (
        |  SELECT g.digit, coalesce(d.n, 0) AS n, e.exp_ppm
        |  FROM g LEFT JOIN d ON g.digit = d.digit
        |  JOIN e ON g.digit = e.digit),
        |p AS (
        |  SELECT digit, CAST(n AS BIGINT) AS n,
        |    CAST(n * 1000000 //
        |      greatest(sum(n) OVER (), 1) AS BIGINT) AS obs_ppm,
        |    CAST(exp_ppm AS BIGINT) AS exp_ppm
        |  FROM j)
        |SELECT digit, n, obs_ppm, exp_ppm,
        |  abs(obs_ppm - exp_ppm) AS dev_ppm,
        |  CAST(sum(abs(obs_ppm - exp_ppm)) OVER () // 9 AS BIGINT)
        |    AS mad_ppm
        |FROM p
        |ORDER BY digit""".stripMargin)),

    // Hot-key skew report: the diagnostic that decides whether a
    // join/agg needs salting — top-20 part keys by lineitem
    // frequency with exact ppm share and cumulative share. The
    // key-grouped agg is the very shuffle the skewed op would pay;
    // the report adds only an N-row window.
    "q297_hot_keys" -> Q(
      (s, dir) => graft.operators.Relational.hotKeys(
          Tables.lineitem(s, dir), "l_partkey", topN = 20)
        .orderBy(col("rank")),
      Some("""WITH c AS (
        |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (SELECT count(*) AS n FROM lineitem),
        |r AS (
        |  SELECT l_partkey, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, l_partkey)
        |      AS BIGINT) AS rank
        |  FROM c)
        |SELECT rank, l_partkey, cnt,
        |  CAST(cnt * 1000000 // t.n AS BIGINT) AS share_ppm,
        |  CAST(sum(cnt) OVER (ORDER BY rank) * 1000000 // t.n
        |    AS BIGINT) AS cum_ppm
        |FROM r CROSS JOIN t
        |WHERE rank <= 20
        |ORDER BY rank""".stripMargin)),

    // "Top 3 + other" presentation rollup: per source, the three
    // most frequent languages keep their identity, the tail folds
    // into one `other` row; exact ppm shares. Ties break by category
    // name so the cut is deterministic in both engines.
    "q300_top_n_other" -> Q(
      (s, dir) => Analytics.topNOther(
          Tables.documents(s, dir), "source", "lang", n = 3)
        .orderBy(col("source"), col("is_other"), col("label")),
      Some("""WITH c AS (
        |  SELECT source, lang, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT source, lang, cnt,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY cnt DESC, lang) AS rk
        |  FROM c),
        |l AS (
        |  SELECT source,
        |    CASE WHEN rk <= 3 THEN lang ELSE 'other' END AS label,
        |    cnt FROM r),
        |a AS (
        |  SELECT source, label, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    count(*) AS n_cats
        |  FROM l GROUP BY 1, 2)
        |SELECT source, label, n_rows, n_cats,
        |  CAST(n_rows * 1000000 //
        |    sum(n_rows) OVER (PARTITION BY source) AS BIGINT)
        |    AS share_ppm,
        |  label = 'other' AS is_other
        |FROM a
        |ORDER BY source, is_other, label""".stripMargin)),

    // Bootstrap A/B lift CI: md5 arm assignment (q226's rule) ×
    // md5-nibble Poisson resampling (q288's draws) — R resampled
    // mean differences from ONE scan, CI by nearest-rank selection.
    // Both engines replay the identical draws, so the whole interval
    // hash-gates — a parametric z-interval (sqrt) never could.
    "q302_ab_bootstrap" -> Q(
      (s, dir) => Analytics.abBootstrapDiff(
        Tables.orders(s, dir), "o_custkey", "o_totalprice",
        replicates = 32, salt = "ab1"),
      Some("""WITH base AS (
        |  SELECT o_custkey AS id,
        |    CAST(trunc(o_totalprice) AS BIGINT) AS v,
        |    CASE WHEN CAST(('0x' || substr(md5(
        |      CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE 0 END AS in_a
        |  FROM orders),
        |g AS (SELECT unnest(generate_series(0, 31)) AS r),
        |w AS (
        |  SELECT g.r, b.v, b.in_a,
        |    CASE WHEN nib < 6 THEN 0 WHEN nib < 12 THEN 1
        |         WHEN nib < 15 THEN 2 ELSE 3 END AS w
        |  FROM base b CROSS JOIN g,
        |    LATERAL (SELECT CAST('0x' ||
        |      substr(md5(b.id || '#' || g.r || '#ab1'), 1, 1)
        |      AS BIGINT) AS nib)),
        |m AS (
        |  SELECT r,
        |    CAST(sum(CASE WHEN in_a = 0 THEN w * v ELSE 0 END) * 1000
        |      // greatest(sum(CASE WHEN in_a = 0 THEN w ELSE 0 END), 1)
        |      -
        |      sum(CASE WHEN in_a = 1 THEN w * v ELSE 0 END) * 1000
        |      // greatest(sum(CASE WHEN in_a = 1 THEN w ELSE 0 END), 1)
        |      AS BIGINT) AS diff_milli
        |  FROM w GROUP BY r),
        |s AS (SELECT diff_milli,
        |        row_number() OVER (ORDER BY diff_milli) AS rk
        |      FROM m),
        |t AS (
        |  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
        |    CAST(sum(1 - in_a) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN in_a = 1 THEN v ELSE 0 END) AS BIGINT)
        |      AS sx_a,
        |    CAST(sum(CASE WHEN in_a = 0 THEN v ELSE 0 END) AS BIGINT)
        |      AS sx_b
        |  FROM base)
        |SELECT n_a, n_b,
        |  sx_a * 1000 // greatest(n_a, 1) AS mean_a_milli,
        |  sx_b * 1000 // greatest(n_b, 1) AS mean_b_milli,
        |  sx_b * 1000 // greatest(n_b, 1) -
        |    sx_a * 1000 // greatest(n_a, 1) AS point_diff_milli,
        |  (SELECT diff_milli FROM s WHERE rk = 2) AS ci_lo_milli,
        |  (SELECT diff_milli FROM s WHERE rk = 31) AS ci_hi_milli,
        |  (SELECT CAST(sum(diff_milli) AS BIGINT) FROM s)
        |    AS sum_diffs_milli
        |FROM t""".stripMargin)),

    // Split-conformal prediction intervals (Mondrian, per-priority):
    // train folds fit the per-category mean, the calibration fold's
    // ceil(0.90·n)-th absolute residual becomes the radius, and the
    // eval fold audits the ≥90% coverage claim. Folds come from
    // groupKFold on o_custkey, so one customer's orders can never
    // straddle calibrate/evaluate — the leakage that silently
    // inflates coverage. All-integer (milli residuals, nearest-rank
    // radius, ppm coverage), so the whole audit hash-gates.
    "q316_conformal_interval" -> Q(
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority"),
            expr("CAST(o_totalprice AS LONG)").as("y"))
        val folded = Corpus.groupKFold(base, "o_custkey", k = 5)
        Classifier.conformalCoverage(folded, "o_orderpriority", "y",
            "fold", calibFold = 0L, evalFold = 1L, levelPct = 90)
          .orderBy(col("cat"))
      },
      Some("""WITH b AS (
        |  SELECT o_orderkey, o_orderpriority AS cat,
        |    CAST(trunc(o_totalprice) AS BIGINT) AS y,
        |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
        |      1, 15)) AS BIGINT) % 5 AS fold
        |  FROM orders),
        |t AS (SELECT cat, count(*) AS n_train,
        |    CAST(sum(y) * 1000 // count(*) AS BIGINT) AS yhat_milli
        |  FROM b WHERE fold NOT IN (0, 1) GROUP BY cat),
        |c AS (SELECT b.cat, abs(y * 1000 - yhat_milli) AS err_milli, y
        |  FROM b JOIN t ON b.cat = t.cat WHERE fold = 0),
        |cr AS (SELECT cat, err_milli,
        |    row_number() OVER (PARTITION BY cat
        |      ORDER BY err_milli, y) AS rnk,
        |    count(*) OVER (PARTITION BY cat) AS n_calib
        |  FROM c),
        |r AS (SELECT cat, CAST(n_calib AS BIGINT) AS n_calib,
        |    err_milli AS radius_milli
        |  FROM cr WHERE rnk = (90 * n_calib + 99) // 100),
        |e AS (SELECT cat, y FROM b WHERE fold = 1)
        |SELECT t.cat, t.n_train, t.yhat_milli, r.n_calib,
        |  r.radius_milli, count(*) AS n_eval,
        |  count(CASE WHEN abs(e.y * 1000 - t.yhat_milli)
        |    <= r.radius_milli THEN 1 END) AS n_covered,
        |  CAST(count(CASE WHEN abs(e.y * 1000 - t.yhat_milli)
        |      <= r.radius_milli THEN 1 END) * 1000000 // count(*)
        |    AS BIGINT) AS coverage_ppm
        |FROM e JOIN t ON e.cat = t.cat JOIN r ON e.cat = r.cat
        |GROUP BY t.cat, t.n_train, t.yhat_milli, r.n_calib,
        |  r.radius_milli
        |ORDER BY t.cat""".stripMargin)),

    // nDCG@5 over graded relevance in exact integer ppm: discount
    // weights ⌊1e6/log₂(i+1)⌋ computed once driver-side and
    // interpolated into BOTH engines as literals, so the classic
    // graded ranking metric hash-gates. System ranking = md5 order
    // per query (a deterministic imperfect ranker), qrels = the
    // doc-derived grade grid; windows all query-bounded.
    "q405_ndcg" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val pool = Tables.documents(s, dir).select(
          (col("doc_id") % 50).as("qid"), col("doc_id").as("doc"),
          (expr("doc_id div 50") % 4).cast("long").as("grade"))
        val ranked = pool.withColumn("rank",
            row_number().over(Window.partitionBy(col("qid"))
              .orderBy(md5(concat(lit("s:"), col("qid").cast("string"),
                lit(":"), col("doc").cast("string"))), col("doc")))
              .cast("long"))
          .filter(col("rank") <= 5)
          .select(col("qid"), col("rank"), col("doc"))
        Eval.ndcgAtK(ranked,
            pool.select(col("qid"), col("doc"), col("grade")), k = 5)
          .orderBy(col("qid"))
      },
      {
        val ws = Eval.ndcgWeightsPpm(5)
        val wVals = ws.zipWithIndex
          .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")
        Some(s"""WITH pool AS (SELECT doc_id % 50 AS qid,
          |    doc_id AS doc,
          |    CAST((doc_id // 50) % 4 AS BIGINT) AS grade
          |  FROM documents),
          |rk AS (SELECT qid, doc, row_number() OVER (
          |    PARTITION BY qid
          |    ORDER BY md5('s:' || qid || ':' || doc), doc) AS rank
          |  FROM pool),
          |w(rank, w) AS (VALUES $wVals),
          |d AS (SELECT rk.qid, CAST(sum(p.grade * w.w) AS BIGINT) AS dcg
          |  FROM rk JOIN w USING (rank)
          |  LEFT JOIN pool p ON rk.qid = p.qid AND rk.doc = p.doc
          |  WHERE rk.rank <= 5 GROUP BY 1),
          |i AS (SELECT qid, CAST(sum(grade * w.w) AS BIGINT) AS idcg
          |  FROM (SELECT qid, grade, doc, row_number() OVER (
          |      PARTITION BY qid ORDER BY grade DESC, doc) AS ir
          |    FROM pool) g
          |  JOIN w ON w.rank = g.ir WHERE g.ir <= 5 GROUP BY 1)
          |SELECT d.qid, d.dcg, coalesce(i.idcg, 0) AS idcg,
          |  CASE WHEN coalesce(i.idcg, 0) = 0 THEN 0
          |       ELSE d.dcg * 1000000 // i.idcg END AS ndcg_ppm
          |FROM d LEFT JOIN i USING (qid) ORDER BY d.qid""".stripMargin)
      }),

    // t-closeness audit (the rung above q283's k-anon/l-diversity):
    // per QI group, the Earth Mover's Distance between the group's
    // sensitive distribution and the global one over the ordered bin
    // axis — Σ|cumulative ppm difference| div (m−1). Shares are
    // integer ppm, the cumulative walk a window sum over the grid,
    // so the whole audit hash-gates.
    "q379_t_closeness" -> Q(
      (s, dir) => Privacy.tClosenessAudit(
          Tables.customer(s, dir), Seq("c_nationkey", "c_mktsegment"),
          floor(col("c_acctbal") / 1000), tPpm = 120000L)
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
      Some("""WITH grid AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS s,
        |    count(*) AS c
        |  FROM customer GROUP BY 1, 2, 3),
        |grp AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |dom AS (SELECT s, CAST(sum(c) AS BIGINT) AS cs
        |  FROM grid GROUP BY 1),
        |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS nt,
        |    count(*) AS m FROM dom),
        |f AS (SELECT g.c_nationkey, g.c_mktsegment, g.n, d.s, d.cs,
        |    t.nt, t.m, gr.c
        |  FROM grp g CROSS JOIN dom d CROSS JOIN tot t
        |  LEFT JOIN grid gr ON gr.c_nationkey = g.c_nationkey
        |    AND gr.c_mktsegment = g.c_mktsegment AND gr.s = d.s),
        |cum AS (SELECT c_nationkey, c_mktsegment, n, m,
        |    sum(coalesce(c * 1000000 // n, 0) - cs * 1000000 // nt)
        |      OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cumd
        |  FROM f),
        |e AS (SELECT c_nationkey, c_mktsegment, n, m,
        |    CAST(sum(abs(cumd)) AS BIGINT) AS semd
        |  FROM cum GROUP BY 1, 2, 3, 4)
        |SELECT c_nationkey, c_mktsegment, n,
        |  CASE WHEN m <= 1 THEN 0 ELSE semd // (m - 1) END AS emd_ppm,
        |  CASE WHEN m <= 1 THEN 0 ELSE semd // (m - 1) END <= 120000
        |    AS t_close
        |FROM e ORDER BY 1, 2""".stripMargin)),

    // Exact two-sample KS drift over document lengths (en vs rest):
    // D in cross-multiplied integers — no float CDFs, no binning —
    // so the drift statistic itself hash-gates. The value frame is
    // domain-bounded (distinct n_chars), never data-sized.
    "q426_ks_drift" -> Q(
      (s, dir) => Analytics.ksStatistic(
        Tables.documents(s, dir).select(col("n_chars"), col("lang")),
        col("lang") === "en", "n_chars"),
      Some("""WITH b AS (SELECT n_chars AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
        |  FROM documents),
        |per AS (SELECT v, CAST(sum(a) AS BIGINT) AS ca,
        |    CAST(count(*) - sum(a) AS BIGINT) AS cb
        |  FROM b GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cca,
        |    CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS ccb
        |  FROM per),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b FROM per)
        |SELECT n_a, n_b,
        |  CAST(max(abs(cca * n_b - ccb * n_a)) AS BIGINT) AS d_num,
        |  CAST(max(abs(cca * n_b - ccb * n_a)) AS BIGINT) * 1000000
        |    // (n_a * n_b) AS d_ppm
        |FROM cum, tot GROUP BY 1, 2""".stripMargin))
  )
}
