package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.{Aggregates, Relational}

/** q01–q10: scans, filters, projections, joins, grouped aggregates
  * (SURVEY §2.3–§2.5).
  */
object CoreQueries extends QueryPack {

  def defs: Map[String, Q] = Map(
    // A1/A5/A8: grouped filtered exact sums over the fact table.
    "q01_pricing_summary" -> Q(
      (s, dir) => Aggregates.pricingSummary(Tables.lineitem(s, dir), "1995-09-02"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1995-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // P2/P4/P12: null-key filter, skip-list anti-filter, projection.
    "q02_filter_project" -> Q(
      (s, dir) =>
        Relational.antiFilter(Tables.events(s, dir), "event_type", Seq("error", "view"))
          .filter(col("user_id").isNotNull)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type
        |FROM events
        |WHERE event_type NOT IN ('error','view') AND user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin)),

    // J1/J4: fact × broadcast dim enrichment, grouped exact revenue.
    "q03_join_enrich" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p  = Tables.part(s, dir)
        Relational.enrich(li, p.withColumnRenamed("p_partkey", "l_partkey"), Seq("l_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(Aggregates.dec2(col("l_extendedprice"))).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)),

    // J8: star join region→nation→customer→orders (all dims broadcast).
    "q04_star_join" -> Q(
      (s, dir) => {
        val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val o = Tables.orders(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            sum(Aggregates.dec2(col("o_totalprice"))).cast("double").as("total_sales"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin)),

    // J2/J3: existence semi-join (customers with an urgent order).
    "q05_semi_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))
        Relational.existsIn(c, urgent, Seq("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)),

    // J6/P9: absence anti-join (customers with no in-progress order).
    "q06_anti_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey"))
        Relational.notIn(c, o, Seq("c_custkey"))
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)),

    // A19/J7: customer boolean rollups incl. inverted NONE-semantics.
    "q07_bool_rollups" -> Q(
      (s, dir) => Aggregates.booleanRollups(Tables.orders(s, dir), "o_custkey", Seq(
        "urgent" -> (col("o_orderpriority") === "1-URGENT"),
        "open"   -> (col("o_orderstatus") === "O"),
        "big"    -> (col("o_totalprice") > 200000.0))),
      Some("""SELECT o_custkey,
        |  max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS any_urgent,
        |  max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS any_open,
        |  max(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS any_big,
        |  CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) = 0 AS INT) AS no_urgent,
        |  CAST(max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) = 0 AS INT) AS no_open,
        |  CAST(max(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) = 0 AS INT) AS no_big
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)),

    // A6/A7: grouped max + filtered count with a time predicate.
    "q08_group_stats" -> Q(
      (s, dir) => Aggregates.groupStats(Tables.orders(s, dir), "o_custkey",
        col("o_totalprice"),
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp")),
      Some("""SELECT o_custkey,
        |  max(o_totalprice) AS max_measure,
        |  count(*) AS n_rows,
        |  count(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' THEN 1 END) AS n_recent
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)),

    // A3/A12: range bucketizer (when-chain) + count per bucket.
    "q09_bucketize" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.withColumn("price_bucket", Aggregates.bucketize(col("o_totalprice"),
            Seq(50000.0 -> "b0_50k", 100000.0 -> "b50_100k", 200000.0 -> "b100_200k"),
            "b200k_plus"))
          .groupBy(col("price_bucket"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("price_bucket"))
      },
      Some("""SELECT CASE WHEN o_totalprice <= 50000.0 THEN 'b0_50k'
        |            WHEN o_totalprice <= 100000.0 THEN 'b50_100k'
        |            WHEN o_totalprice <= 200000.0 THEN 'b100_200k'
        |            ELSE 'b200k_plus' END AS price_bucket,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY 1
        |ORDER BY price_bucket""".stripMargin)),

    // P10: deterministic key-hash sampling throttle.
    "q10_sample_by_key" -> Q(
      (s, dir) => Relational.sampleByKey(Tables.customer(s, dir), "c_custkey", 10)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey""".stripMargin)),

    // Skew lever under the oracle gate: two-phase salted aggregation
    // over a 3-hot-key grouping (l_returnflag). Salting spreads each
    // hot key over 16 reducers; the oracle is the PLAIN group-by — the
    // gate proves the salt/re-aggregate decomposition changes the
    // plan, never the algebra (DECIMAL-exact sums make that provable).
    "q90_salted_agg" -> Q(
      (s, dir) => graft.operators.Skew.saltedSumCount(
          Tables.lineitem(s, dir).select(col("l_returnflag"),
            col("l_quantity").cast(DecimalType(18, 2)).as("qty")),
          "l_returnflag", col("qty"), factor = 16)
        .select(col("l_returnflag"),
          col("sum_value").cast("double").as("sum_qty"), col("n_rows"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // The other skew lever: salted join — fact rows spread over
    // (key, salt), build side replicated once per salt. The oracle is
    // the plain join + group-by; DECIMAL-exact sums prove replication
    // neither drops nor double-counts a single fact row.
    "q92_salted_join" -> Q(
      (s, dir) => {
        val fact = Tables.lineitem(s, dir)
          .select(col("l_suppkey").as("suppkey"),
            col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
        val build = Tables.supplier(s, dir)
          .select(col("s_suppkey").as("suppkey"),
            col("s_nationkey").as("nationkey"))
        graft.operators.Skew.saltedJoin(fact, build, "suppkey", factor = 8)
          .groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("__sq"))
          .select(col("nationkey"), col("n_items"),
            col("__sq").cast("double").as("sum_qty"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT s_nationkey AS nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1
        |ORDER BY nationkey""".stripMargin)),

    // The skew levers COMPOSED the way production uses them: detect
    // hot keys -> salt only the hot slice -> plain-join the cold
    // slice -> union. The oracle is the PLAIN join + group-by, so the
    // gate proves the adaptive split/salt/replicate path neither
    // drops nor double-counts a row on actually-skewed routing
    // decisions (hot membership is data-driven, not hand-picked).
    "q323_adaptive_skew_join" -> Q(
      (s, dir) => {
        val fact = Tables.lineitem(s, dir)
          .select(col("l_partkey").as("partkey"),
            col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
        val build = Tables.part(s, dir)
          .select(col("p_partkey").as("partkey"), col("p_brand"))
        graft.operators.Skew
          .adaptiveSkewJoin(fact, build, "partkey", topN = 10, factor = 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("__sq"))
          .select(col("p_brand"), col("n_items"),
            col("__sq").cast("double").as("sum_qty"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1
        |ORDER BY p_brand""".stripMargin)),

    // CDC snapshot diff: two simulated snapshots of the customer dim
    // (membership drift via modulus filters, value drift via a
    // perturbed balance) classified added/removed/changed/unchanged —
    // one full-outer join, null-safe comparisons.
    "q143_snapshot_diff" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val oldSnap = c.filter(col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val newSnap = c.filter(col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey"), col("c_name"),
            when(col("c_custkey") % 11 === 0, col("c_acctbal") + 10.0)
              .otherwise(col("c_acctbal")).as("c_acctbal"))
        graft.operators.Relational.snapshotDiff(oldSnap, newSnap,
            Seq("c_custkey"), Seq("c_name", "c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH o AS (SELECT c_custkey, c_name, c_acctbal
        |       FROM customer WHERE c_custkey % 7 <> 0),
        |n AS (SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 10.0
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 5 <> 0)
        |SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'added'
        |       WHEN n.c_custkey IS NULL THEN 'removed'
        |       WHEN o.c_name IS DISTINCT FROM n.c_name
        |         OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |         THEN 'changed'
        |       ELSE 'unchanged' END AS change
        |FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
        |ORDER BY c_custkey""".stripMargin)),

    // MERGE INTO semantics: apply a derived changeset (inserts,
    // updates, deletes on the customer snapshot) through one
    // full-outer key join — and the gate's strongest property, that
    // applying q143's diff to the old snapshot reproduces the new one,
    // is what the oracle replays: it computes the expected post-merge
    // state directly from the change rules.
    // Right-to-erasure cascade audit: a subject set (customers with
    // key % 13 = 0) followed down the FK chain customer → orders →
    // lineitem; per-table affected/surviving counts — the manifest a
    // deletion job emits before any destructive write. Each level is
    // one semi-join against the previous level's key-grain frame.
    "q228_erasure_cascade" -> Q(
      (s, dir) => {
        val subjects = Tables.customer(s, dir)
          .filter(col("c_custkey") % 13 === 0)
          .select(col("c_custkey"))
        Relational.erasureCascade(subjects, "c_custkey", Seq(
            ("customer", Tables.customer(s, dir), "c_custkey", None),
            ("orders", Tables.orders(s, dir), "o_orderkey",
              Some("o_custkey")),
            ("lineitem", Tables.lineitem(s, dir), "l_orderkey",
              Some("l_orderkey"))))
          .orderBy(col("tbl"))
      },
      Some("""WITH s AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 13 = 0),
        |ao AS (SELECT o_orderkey FROM orders
        |       WHERE o_custkey IN (SELECT c_custkey FROM s)),
        |r AS (
        |  SELECT 'customer' AS tbl,
        |    (SELECT count(*) FROM customer) AS n_rows,
        |    (SELECT count(*) FROM customer
        |      WHERE c_custkey IN (SELECT c_custkey FROM s)) AS n_affected
        |  UNION ALL
        |  SELECT 'orders', (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM ao)
        |  UNION ALL
        |  SELECT 'lineitem', (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem
        |      WHERE l_orderkey IN (SELECT o_orderkey FROM ao)))
        |SELECT tbl, n_rows, n_affected,
        |  n_rows - n_affected AS n_surviving
        |FROM r ORDER BY tbl""".stripMargin)),

    "q186_cdc_apply" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val snapshot = c.filter(col("c_custkey") % 7 =!= 0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        // changeset: delete key%5=0, update key%11=0 (+10 balance),
        // insert the %7 rows the snapshot lacks
        val deletes = snapshot.filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            lit("D").as("op"))
        val updates = snapshot
          .filter(col("c_custkey") % 11 === 0 && col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + 10.0).as("c_acctbal"), lit("U").as("op"))
        val inserts = c.filter(col("c_custkey") % 7 === 0)
          .filter(col("c_custkey") % 5 =!= 0)
          .select(col("c_custkey"), col("c_name"),
            // late inserts arrive post-update: the %11 adjustment
            // applies to them too (keeps the expected state closed-form)
            when(col("c_custkey") % 11 === 0, col("c_acctbal") + 10.0)
              .otherwise(col("c_acctbal")).as("c_acctbal"),
            lit("I").as("op"))
        Relational.applyChanges(snapshot,
            deletes.union(updates).union(inserts),
            Seq("c_custkey"), Seq("c_name", "c_acctbal"), "op")
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 10.0
        |       ELSE c_acctbal END AS c_acctbal
        |FROM customer
        |WHERE c_custkey % 5 <> 0
        |ORDER BY c_custkey""".stripMargin)),

    // SCD2 bulk timeline reconstruction: the events change log becomes
    // per-user validity intervals over event_type — rows that repeat
    // the previous state collapse, every change opens an interval,
    // valid_to chains to the next change (NULL = current). One keyed
    // shuffle; both window passes share its sort. The oracle replays
    // the identical lag/lead formulation.
    "q217_scd2_timeline" -> Q(
      (s, dir) => graft.operators.Scd2.fromChangeLog(
          Tables.events(s, dir), Seq("user_id"), Seq("event_type"),
          "ts", "event_id")
        .orderBy(col("user_id"), col("valid_from"), col("event_type"),
          col("valid_to").asc_nulls_first),
      Some("""WITH m AS (SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER w AS rn, lag(event_type) OVER w AS prev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT * FROM m
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |f AS (SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM f
        |ORDER BY user_id, valid_from, event_type, valid_to NULLS FIRST"""
        .stripMargin)),

    // SCD2 incremental maintenance: one nightly latest-state batch
    // merged into an existing history — changed keys close their
    // current version and open a new one, no-op updates leave the row
    // untouched (idempotent replay), first-seen keys insert. All four
    // branches are exercised by modulus classes, so the oracle states
    // the expected post-merge history closed-form.
    "q218_scd2_merge" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        def d(x: String) = to_date(lit(x))
        val history = c.select(col("c_custkey"),
            col("c_mktsegment").as("seg"),
            d("2020-01-01").as("valid_from"),
            lit(null).cast("date").as("valid_to"))
          .unionByName(c.filter(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), lit("LEGACY").as("seg"),
              d("2019-01-01").as("valid_from"),
              d("2020-01-01").as("valid_to")))
        val updates = c.filter(col("c_custkey") % 4 === 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 8 === 0, col("c_mktsegment"))
              .otherwise(concat(lit("SEG_"), col("c_custkey") % 5)).as("seg"),
            d("2021-06-15").as("eff_ts"))
          .unionByName(c.filter(col("c_custkey") % 9 === 0)
            .select((col("c_custkey") + 10000000L).as("c_custkey"),
              lit("NEW").as("seg"), d("2021-06-15").as("eff_ts")))
        graft.operators.Scd2.merge(history, updates,
            Seq("c_custkey"), Seq("seg"), "eff_ts")
          .orderBy(col("c_custkey"), col("valid_from"))
      },
      Some("""WITH rows AS (
        |  SELECT c_custkey, 'LEGACY' AS seg, DATE '2019-01-01' AS valid_from,
        |    DATE '2020-01-01' AS valid_to
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, DATE '2020-01-01', DATE '2021-06-15'
        |  FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 8 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, DATE '2020-01-01', NULL
        |  FROM customer WHERE NOT (c_custkey % 4 = 0 AND c_custkey % 8 <> 0)
        |  UNION ALL
        |  SELECT c_custkey, 'SEG_' || CAST(c_custkey % 5 AS VARCHAR),
        |    DATE '2021-06-15', NULL
        |  FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 8 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'NEW', DATE '2021-06-15', NULL
        |  FROM customer WHERE c_custkey % 9 = 0)
        |SELECT c_custkey, seg, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM rows
        |ORDER BY c_custkey, valid_from""".stripMargin)),

    // ANALYZE-style column profile of the documents table in one
    // pass: per-column null and exact distinct counts in long format
    // (the statistics collection pass a governance layer runs before
    // publishing a corpus snapshot).
    "q174_column_profile" -> Q(
      (s, dir) => Relational.profileColumns(
          Tables.documents(s, dir), Seq("lang", "n_chars", "source", "text"))
        .orderBy(col("column_name")),
      Some("""SELECT 'lang' AS column_name, count(*) AS n_rows,
        |  count(*) - count(lang) AS n_nulls,
        |  count(DISTINCT lang) AS n_distinct FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |  count(DISTINCT n_chars) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |  count(DISTINCT source) FROM documents
        |UNION ALL
        |SELECT 'text', count(*), count(*) - count(text),
        |  count(DISTINCT text) FROM documents
        |ORDER BY column_name""".stripMargin)),

    // Referential-integrity audit over three FK edges; the first edge
    // is PLANTED with two orphan keys and a null so every counter is
    // exercised (the real edges are clean — q147's planted-gate
    // discipline).
    "q175_fk_audit" -> Q(
      (s, dir) => {
        import s.implicits._
        val planted = Seq(Some(-1L), Some(-5L), Option.empty[Long])
          .toDF("o_custkey")
        def tag(name: String, d: org.apache.spark.sql.DataFrame) =
          d.select(lit(name).as("relation"), col("n_rows"),
            col("n_null_fk"), col("n_orphans"), col("n_matched"))
        val a1 = tag("orders->customer", Relational.fkAudit(
          Tables.orders(s, dir).select(col("o_custkey")).union(planted),
          "o_custkey", Tables.customer(s, dir), "c_custkey"))
        val a2 = tag("lineitem->part", Relational.fkAudit(
          Tables.lineitem(s, dir), "l_partkey",
          Tables.part(s, dir), "p_partkey"))
        val a3 = tag("lineitem->supplier", Relational.fkAudit(
          Tables.lineitem(s, dir), "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"))
        a1.union(a2).union(a3).orderBy(col("relation"))
      },
      Some("""WITH f1 AS (SELECT o_custkey AS fk FROM orders
        |    UNION ALL SELECT * FROM (VALUES (CAST(-1 AS BIGINT)),
        |      (CAST(-5 AS BIGINT)), (CAST(NULL AS BIGINT))) t(fk)),
        |d1 AS (SELECT DISTINCT c_custkey AS pk FROM customer),
        |d2 AS (SELECT DISTINCT p_partkey AS pk FROM part),
        |d3 AS (SELECT DISTINCT s_suppkey AS pk FROM supplier),
        |a1 AS (SELECT 'orders->customer' AS relation,
        |    count(*) AS n_rows,
        |    count(*) - count(f.fk) AS n_null_fk,
        |    count(CASE WHEN f.fk IS NOT NULL AND d1.pk IS NULL
        |      THEN 1 END) AS n_orphans,
        |    count(d1.pk) AS n_matched
        |  FROM f1 f LEFT JOIN d1 ON f.fk = d1.pk),
        |a2 AS (SELECT 'lineitem->part', count(*),
        |    count(*) - count(l.l_partkey),
        |    count(CASE WHEN l.l_partkey IS NOT NULL AND d2.pk IS NULL
        |      THEN 1 END),
        |    count(d2.pk)
        |  FROM lineitem l LEFT JOIN d2 ON l.l_partkey = d2.pk),
        |a3 AS (SELECT 'lineitem->supplier', count(*),
        |    count(*) - count(l.l_suppkey),
        |    count(CASE WHEN l.l_suppkey IS NOT NULL AND d3.pk IS NULL
        |      THEN 1 END),
        |    count(d3.pk)
        |  FROM lineitem l LEFT JOIN d3 ON l.l_suppkey = d3.pk)
        |SELECT * FROM (
        |  SELECT * FROM a1 UNION ALL SELECT * FROM a2
        |  UNION ALL SELECT * FROM a3)
        |ORDER BY relation""".stripMargin)),

    // Rendezvous (HRW) shard routing with the minimal-movement
    // property made visible: each doc's shard under 4 and under 5
    // shards plus the moved flag — growing the ring moves only keys
    // the NEW shard wins (≈1/5), where mod-hashing reshuffles ≈4/5.
    // Pure projection; the oracle replays the argmax as a ranked
    // (weight DESC, shard DESC) window.
    "q274_rendezvous_sharding" -> Q(
      (s, dir) => {
        import graft.operators.Relational
        Tables.documents(s, dir).select(col("doc_id"),
            Relational.rendezvousShard(col("doc_id"), 4).as("shard4"),
            Relational.rendezvousShard(col("doc_id"), 5).as("shard5"))
          .withColumn("moved", col("shard4") =!= col("shard5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
        |  SELECT doc_id, sh,
        |    CAST(('0x' || substr(md5(doc_id || '#' || sh), 1, 15))
        |      AS BIGINT) AS w
        |  FROM documents CROSS JOIN
        |    (SELECT unnest(generate_series(0, 4)) AS sh)),
        |r4 AS (
        |  SELECT doc_id, sh AS shard4 FROM (
        |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY w DESC, sh DESC) AS rn
        |    FROM c WHERE sh < 4) WHERE rn = 1),
        |r5 AS (
        |  SELECT doc_id, sh AS shard5 FROM (
        |    SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY w DESC, sh DESC) AS rn
        |    FROM c) WHERE rn = 1)
        |SELECT r4.doc_id, CAST(shard4 AS INT) AS shard4,
        |  CAST(shard5 AS INT) AS shard5,
        |  shard4 <> shard5 AS moved
        |FROM r4 JOIN r5 ON r4.doc_id = r5.doc_id
        |ORDER BY r4.doc_id""".stripMargin)),

    // Join-view incremental maintenance: the materialized inner join
    // of 80% of orders × 95% of customers, then the remaining 20% /
    // 5% arrive as append deltas. deltaJoinUpdates produces exactly
    // the view delta (ΔL⋈(R∪ΔR) ∪ L⋈ΔR — the ΔL⋈ΔR term folded so
    // no pair lands twice); view0 ∪ Δ must equal the from-scratch
    // join, which is precisely what the oracle recomputes. At scale
    // each term is a broadcast-delta against one base stream — the
    // base⋈base join of a full refresh never re-runs.
    "q279_ivm_delta_join" -> Q(
      (s, dir) => {
        import graft.operators.Relational
        val o = Tables.orders(s, dir)
          .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
            col("o_totalprice"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        val oldO = o.filter(col("o_orderkey") % 10 < 8)
        val newO = o.filter(col("o_orderkey") % 10 >= 8)
        val oldC = c.filter(col("c_custkey") % 20 =!= 0)
        val newC = c.filter(col("c_custkey") % 20 === 0)
        val view0 = oldO.join(oldC, Seq("c_custkey"), "inner")
        val delta = Relational.deltaJoinUpdates(
          oldO, newO, oldC, newC, Seq("c_custkey"))
        view0.unionByName(delta)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
        |  c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)),

    // 2-D Pareto front per source: documents not dominated on
    // (n_chars, token count) — multi-criteria corpus selection with
    // no weighting. Spark runs the collapsed-frame window (distinct
    // x grain, never all-pairs); the oracle is the definitional
    // O(n²) NOT EXISTS — agreement proves the window formulation IS
    // the skyline.
    "q280_skyline" -> Q(
      (s, dir) => {
        import graft.operators.Relational
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Relational.skyline2d(docs, "source", "n_chars", "n_tokens")
          .select(col("source"), col("n_chars"), col("n_tokens"),
            col("doc_id"))
          .orderBy(col("source"), col("n_chars"), col("doc_id"))
      },
      Some("""WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, n_chars, n_tokens, doc_id FROM t r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM t s
        |  WHERE s.source = r.source
        |    AND s.n_chars >= r.n_chars AND s.n_tokens >= r.n_tokens
        |    AND (s.n_chars > r.n_chars OR s.n_tokens > r.n_tokens))
        |ORDER BY source, n_chars, doc_id""".stripMargin)),

    // Replica comparison via bucket checksums: replica B is the
    // orders table (unique o_orderkey) with injected deletes (k%97),
    // in-place edits (k%89) and inserts (k+10M for k%101).
    // replicaDiff exchanges 64 per-bucket (count, XOR-of-signature)
    // rows and runs the exact keyed diff only inside diverged
    // buckets; the oracle computes the definitional full-outer diff
    // — agreement proves the narrowed protocol finds every
    // divergence on this fixture. At 100 TB the difference is
    // bytes-per-bucket on the wire vs shuffling both replicas.
    "q282_replica_diff" -> Q(
      (s, dir) => {
        import graft.operators.Relational
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey").as("k"), col("o_orderstatus"),
            col("o_totalprice"))
        val edited = base.filter(col("k") % 97 =!= 0)
          .withColumn("o_totalprice",
            when(col("k") % 89 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")))
        val inserted = base.filter(col("k") % 101 === 0)
          .select((col("k") + 10000000L).as("k"), col("o_orderstatus"),
            col("o_totalprice"))
        val replicaB = edited.unionByName(inserted)
        Relational.replicaDiff(base, replicaB, "k",
            Seq("o_orderstatus", "o_totalprice"), nBuckets = 64)
          .filter(col("change") =!= "unchanged")
          .orderBy(col("k"))
      },
      Some("""WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus, o_totalprice
        |  FROM orders),
        |b AS (
        |  SELECT k, o_orderstatus,
        |    CASE WHEN k % 89 = 0 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT k + 10000000, o_orderstatus, o_totalprice
        |  FROM base WHERE k % 101 = 0)
        |SELECT COALESCE(a.k, b.k) AS k,
        |  CASE WHEN a.k IS NULL THEN 'added'
        |       WHEN b.k IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  COALESCE(a.k, b.k) % 64 AS bucket
        |FROM base a FULL JOIN b ON a.k = b.k
        |WHERE a.k IS NULL OR b.k IS NULL
        |  OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |  OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |ORDER BY k""".stripMargin)),

    // The SQL-API surface: the corpus quality rollup expressed as
    // PURE spark.sql over registered temp views — the entry path a
    // SQL-first consumer of this library uses. Same Catalyst plan as
    // the DataFrame form (one scan, one partial agg); the gate proves
    // the SQL dialect subset used is ANSI-portable.
    "q413_sql_api" -> Q(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_docs")
        s.sql("""
          SELECT source,
                 count(*) AS n_docs,
                 sum(n_chars) AS total_chars,
                 count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
                 min(n_chars) AS min_chars,
                 max(n_chars) AS max_chars
          FROM g_docs
          GROUP BY source
          ORDER BY source""")
      },
      Some("""SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin)),

    // The SQL-registered NATIVE function surface: graft_dot — the
    // codegen dot-product expression injected via
    // SparkSessionExtensions — called from pure SQL. Proves the
    // extension registration end to end; the oracle replays the
    // strict left-to-right fold, which the native kernel is
    // spec-proven bit-identical to.
    "q421_sql_native_fn" -> Q(
      (s, dir) => {
        Tables.embeddings(s, dir).createOrReplaceTempView("g_emb")
        s.sql("""
          SELECT a.vec_id AS qid, b.vec_id AS cid,
                 graft_dot(a.embedding, b.embedding) AS dot
          FROM g_emb a JOIN g_emb b ON b.vec_id = a.vec_id + 1
          WHERE a.vec_id % 50 = 0
          ORDER BY qid""")
      },
      Some(s"""WITH e AS (SELECT vec_id,
        |    ${SimilarityQueries.vSql} AS v FROM embeddings)
        |SELECT a.vec_id AS qid, b.vec_id AS cid,
        |  ${SimilarityQueries.dd("a.v", "b.v")} AS dot
        |FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id % 50 = 0
        |ORDER BY qid""".stripMargin)),

    // The typed Dataset[T] surface: a case-class pipeline
    // (filter → groupByKey → mapGroups) with compile-time field
    // safety — the Scala-first entry path, gated like everything
    // else. Encoders keep the plan columnar (no opaque closures in
    // the scan); the per-group fold is the one deliberate typed step.
    "q414_typed_dataset" -> Q(
      (s, dir) => {
        import s.implicits._
        val ds = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            coalesce(col("lang"), lit("")).as("lang"),
            col("n_chars"))
          .as[graft.model.DocMeta]
        ds.filter(_.n_chars >= 100)
          .groupByKey(_.source)
          .mapGroups { (src, rows) =>
            var n = 0L; var en = 0L; var maxC = 0L
            rows.foreach { d =>
              n += 1
              if (d.lang == "en") en += 1
              if (d.n_chars > maxC) maxC = d.n_chars
            }
            graft.model.SourceStats(src, n, en, maxC)
          }
          .toDF()
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents WHERE n_chars >= 100
        |GROUP BY source ORDER BY source""".stripMargin))
  )
}
