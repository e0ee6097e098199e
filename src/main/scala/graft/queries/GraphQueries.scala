package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{FuzzyMatch, Graph}

/** Graph + entity-resolution operators over the star schema: blocked
  * fuzzy matching (q168), integer-quantized PageRank (q169), the
  * degree-oriented triangle census (q208), and item-item
  * collaborative filtering (q227) — corpus governance and
  * recommendation shapes re-expressed over the TPC-H-ish tables so
  * all are fully DuckDB-oracle-gated.
  */
object GraphQueries extends QueryPack {

  /** The nation-grain trade graph: customer nation → supplier nation
    * for every lineitem, deduped. Stands in for the crawl-domain link
    * graph (node count ≪ row count, edges derived by join + distinct).
    */
  private val edgesCte: String =
    """e AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey)""".stripMargin

  def defs: Map[String, Q] = Map(
    // Blocked fuzzy entity resolution: distinct-first (64 names
    // regardless of SF), blocked on the trailing token, Levenshtein ≤ 2
    // inside the block. Both engines' levenshtein is the classic edit
    // distance, so the match set is oracle-exact.
    "q168_fuzzy_match" -> Q(
      (s, dir) => FuzzyMatch.blockedNameMatch(
          Tables.part(s, dir), "p_name",
          nm => element_at(split(nm, " "), 2), maxDist = 2)
        .orderBy(col("name_a"), col("name_b")),
      Some("""WITH n AS (SELECT DISTINCT p_name AS nm FROM part),
        |b AS (SELECT nm, split_part(nm, ' ', 2) AS blk FROM n)
        |SELECT a.nm AS name_a, b2.nm AS name_b,
        |  CAST(levenshtein(a.nm, b2.nm) AS INT) AS dist
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.nm < b2.nm
        |WHERE levenshtein(a.nm, b2.nm) <= 2
        |ORDER BY name_a, name_b""".stripMargin)),

    // Damped PageRank, 3 rounds, integer ppm arithmetic (floor
    // division at the contribution and damping steps) — order-free, so
    // the unrolled-CTE oracle replays the iteration bit-exactly.
    "q169_pagerank" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        val edges = l
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .select(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
        Graph.pageRankPpm(edges, "src", "dst", iters = 3)
          .select(col("node").cast("long").as("node"), col("rank_ppm"))
          .orderBy(col("node"))
      },
      {
        val iterCtes = (1 to 3).map { i =>
          s"""f$i AS (SELECT e.dst AS node,
             |    CAST(sum(r.rank_ppm // d.out_deg) AS BIGINT) AS in_sum
             |  FROM e JOIN r${i - 1} r ON e.src = r.node
             |  JOIN d ON e.src = d.src GROUP BY e.dst),
             |r$i AS (SELECT n.node,
             |    CAST(150000 + (850000 * coalesce(f.in_sum, 0)) // 1000000
             |      AS BIGINT) AS rank_ppm
             |  FROM n LEFT JOIN f$i f USING (node))""".stripMargin
        }.mkString(",\n")
        Some(s"""WITH $edgesCte,
          |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |d AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
          |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_ppm FROM n),
          |$iterCtes
          |SELECT CAST(node AS BIGINT) AS node, rank_ppm
          |FROM r3
          |ORDER BY node""".stripMargin)
      }),

    // Triangle census of the co-purchase graph (parts sharing an
    // order), degree-oriented: edges direct low-(degree, id) → high,
    // wedges are out-edge pairs of their lowest-rank pivot (each
    // triangle counted once, hub-quadratic term gone), closed by one
    // directed-edge probe. The oracle replays the SAME orientation —
    // n_wedges is orientation-defined, n_triangles invariant. The
    // closure ratio is integer ppm, so the whole census hash-gates.
    "q208_triangle_count" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = l.as("a")
          .join(l.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"),
            col("b.l_partkey").as("dst"))
        Graph.triangleCount(pairs, "src", "dst")
      },
      Some("""WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey),
        |d AS (SELECT n, count(*) AS dg FROM (
        |    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        |  GROUP BY n),
        |o AS (
        |  SELECT
        |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |         THEN e.u ELSE e.v END AS s,
        |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |         THEN e.v ELSE e.u END AS t,
        |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
        |         THEN dv.dg ELSE du.dg END AS td
        |  FROM e JOIN d du ON du.n = e.u JOIN d dv ON dv.n = e.v),
        |w AS (SELECT o1.t AS a, o2.t AS c
        |      FROM o o1 JOIN o o2 ON o1.s = o2.s
        |       AND (o1.td < o2.td OR (o1.td = o2.td AND o1.t < o2.t))),
        |m AS (SELECT count(*) AS n_wedges,
        |        CAST(count(e3.s) AS BIGINT) AS n_triangles
        |      FROM w LEFT JOIN o e3 ON w.a = e3.s AND w.c = e3.t)
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  n_wedges, n_triangles,
        |  CASE WHEN n_wedges > 0
        |       THEN (1000000 * n_triangles) // n_wedges
        |       ELSE 0 END AS closed_ppm
        |FROM m""".stripMargin)),

    // Item-item collaborative filtering ("bought X also bought Y"):
    // order = basket, part = item; pairs arise ONLY from shared
    // baskets (C(basket,2) candidates — basket-width-bounded, the
    // co-occurrence blocking), similarity = basket-set Jaccard in
    // exact ppm, top-5 neighbors per item by (sim desc, id).
    "q227_item_cf" -> Q(
      (s, dir) => Graph.itemSimilarityTopK(
          Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", k = 5)
        .orderBy(col("item"), col("rank")),
      Some("""WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |sz AS (SELECT i, count(*) AS sz FROM bi GROUP BY i),
        |p AS (SELECT x.i AS item, y.i AS neighbor, count(*) AS n_common
        |      FROM bi x JOIN bi y ON x.b = y.b AND x.i <> y.i
        |      GROUP BY 1, 2),
        |s AS (SELECT p.item, p.neighbor, p.n_common,
        |        a.sz AS n_item, c.sz AS n_neighbor,
        |        (1000000 * p.n_common) //
        |          (a.sz + c.sz - p.n_common) AS jaccard_ppm
        |      FROM p JOIN sz a ON a.i = p.item
        |             JOIN sz c ON c.i = p.neighbor),
        |r AS (SELECT *, row_number() OVER (PARTITION BY item
        |        ORDER BY jaccard_ppm DESC, neighbor) AS rank
        |      FROM s)
        |SELECT item, neighbor, n_common, n_item, n_neighbor,
        |  jaccard_ppm, rank
        |FROM r WHERE rank <= 5
        |ORDER BY item, rank""".stripMargin)),

    // Hierarchy flattening — the recursive-CTE query Spark cannot
    // write, answered by iterative doubling in ⌈log₂ depth⌉ joins:
    // node i's parent is i div 2 (a binary tree over doc ids), and
    // the output is every (node, ancestor, distance) triple. The
    // oracle IS DuckDB's native WITH RECURSIVE — a green hash proves
    // the doubling loop reproduces true recursion exactly.
    "q258_tree_closure" -> Q(
      (s, dir) => {
        val edges = Tables.documents(s, dir)
          .select((col("doc_id") + 1L).as("node"))
          .filter(col("node") >= 2L)
          .select(col("node"), expr("node div 2").as("parent"))
        graft.operators.Graph
          .transitiveClosure(edges, "node", "parent")
          .select(col("src").as("node"), col("dst").as("ancestor"),
            col("dist"))
          .orderBy(col("node"), col("dist"))
      },
      Some("""WITH RECURSIVE anc AS (
        |  SELECT doc_id + 1 AS node, (doc_id + 1) // 2 AS ancestor,
        |    1 AS dist
        |  FROM documents WHERE doc_id + 1 >= 2
        |  UNION ALL
        |  SELECT node, ancestor // 2, dist + 1
        |  FROM anc WHERE ancestor >= 2)
        |SELECT node, ancestor, CAST(dist AS BIGINT) AS dist
        |FROM anc
        |ORDER BY node, dist""".stripMargin)),

    // HITS hubs & authorities on the nation trade graph, 2 rounds of
    // integer-ppm mutual reinforcement with max-normalization (the
    // q169 discipline — integral div keeps every round in BIGINT so
    // the unrolled-CTE oracle replays it bit-exactly; a float L2
    // norm could never hash-gate). auth uses the CURRENT round's hub,
    // hub the CURRENT round's auth — Kleinberg's update order.
    "q290_hits" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        val edges = l
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .select(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
        Graph.hitsPpm(edges, "src", "dst", iters = 2)
          .select(col("node").cast("long").as("node"),
            col("auth_ppm"), col("hub_ppm"))
          .orderBy(col("node"))
      },
      {
        val iterCtes = (1 to 2).map { i =>
          s"""ar$i AS (SELECT e.dst AS node,
             |    CAST(sum(h${i - 1}.hub_ppm) AS BIGINT) AS raw
             |  FROM e JOIN h${i - 1} ON e.src = h${i - 1}.node
             |  GROUP BY 1),
             |am$i AS (SELECT greatest(max(raw), 1) AS mx FROM ar$i),
             |a$i AS (SELECT n.node,
             |    CAST((1000000 * coalesce(ar.raw, 0)) // am.mx
             |      AS BIGINT) AS auth_ppm
             |  FROM n LEFT JOIN ar$i ar USING (node) CROSS JOIN am$i am),
             |hr$i AS (SELECT e.src AS node,
             |    CAST(sum(a$i.auth_ppm) AS BIGINT) AS raw
             |  FROM e JOIN a$i ON e.dst = a$i.node
             |  GROUP BY 1),
             |hm$i AS (SELECT greatest(max(raw), 1) AS mx FROM hr$i),
             |h$i AS (SELECT n.node,
             |    CAST((1000000 * coalesce(hr.raw, 0)) // hm.mx
             |      AS BIGINT) AS hub_ppm
             |  FROM n LEFT JOIN hr$i hr USING (node) CROSS JOIN hm$i hm)"""
            .stripMargin
        }.mkString(",\n")
        Some(s"""WITH $edgesCte,
          |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub_ppm
          |       FROM n),
          |$iterCtes
          |SELECT CAST(n.node AS BIGINT) AS node, a2.auth_ppm,
          |  h2.hub_ppm
          |FROM n JOIN a2 ON n.node = a2.node
          |JOIN h2 ON n.node = h2.node
          |ORDER BY node""".stripMargin)
      }),

    // Golden-record entity resolution (the MDM composition): q168's
    // blocked fuzzy matches → connected components → one canonical
    // record per entity cluster with deterministic survivorship
    // (canonical name = cluster minimum, golden key = min part key,
    // coverage counts). Matchless names pass through as their own
    // cluster via the left join. The oracle replays the closure with
    // a recursive CTE over the symmetric match edges — agreement
    // proves the distributed min-label CC computes the same
    // partition of the name space.
    "q292_golden_record" -> Q(
      (s, dir) => {
        val part = Tables.part(s, dir)
        val matches = FuzzyMatch.blockedNameMatch(
          part, "p_name", nm => element_at(split(nm, " "), 2),
          maxDist = 2)
        val labels = graft.operators.Dedup.dedupGroups(
          matches.select(col("name_a").as("id_a"),
            col("name_b").as("id_b")))
        val canon = part.select(col("p_name"), col("p_partkey"))
          .join(labels.select(col("id").as("p_name"),
            col("canonical_id")), Seq("p_name"), "left")
          .withColumn("canonical_name",
            coalesce(col("canonical_id"), col("p_name")))
        canon.groupBy(col("canonical_name"))
          .agg(count_distinct(col("p_name")).as("n_names"),
            count(lit(1)).as("n_rows"),
            min(col("p_partkey")).as("golden_partkey"))
          .orderBy(col("canonical_name"))
      },
      Some("""WITH RECURSIVE n AS (
        |  SELECT DISTINCT p_name AS nm FROM part),
        |b AS (SELECT nm, split_part(nm, ' ', 2) AS blk FROM n),
        |e AS (
        |  SELECT a.nm AS x, b2.nm AS y
        |  FROM b a JOIN b b2 ON a.blk = b2.blk AND a.nm < b2.nm
        |  WHERE levenshtein(a.nm, b2.nm) <= 2),
        |sym AS (SELECT x, y FROM e UNION SELECT y, x FROM e),
        |reach(nm, r) AS (
        |  SELECT nm, nm FROM n
        |  UNION
        |  SELECT reach.nm, sym.y FROM reach
        |  JOIN sym ON reach.r = sym.x),
        |canon AS (SELECT nm, min(r) AS canonical_name
        |          FROM reach GROUP BY nm)
        |SELECT c.canonical_name,
        |  count(DISTINCT p.p_name) AS n_names,
        |  count(*) AS n_rows,
        |  min(p.p_partkey) AS golden_partkey
        |FROM part p JOIN canon c ON p.p_name = c.nm
        |GROUP BY 1
        |ORDER BY 1""".stripMargin)),

    // Stationary distribution of the user-journey Markov chain:
    // transition counts from per-user event successions (one keyed
    // window), row-stochastic ppm matrix, 3 integer power-iteration
    // rounds (floor at the edge product AND the row normalization —
    // the q169 discipline, so the unrolled oracle replays the chain
    // bit-exactly). Where the raw transition counts (q241's grain)
    // say what FOLLOWS what, the stationary vector says where the
    // journey SPENDS its time.
    "q301_markov_stationary" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .withColumn("src", lag(col("event_type"), 1).over(w))
          .filter(col("src").isNotNull)
          .groupBy(col("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).as("cnt"))
        Graph.markovStationaryPpm(tr, "src", "dst", "cnt", iters = 3)
          .orderBy(col("state"))
      },
      {
        val iterCtes = (1 to 3).map { i =>
          s"""f$i AS (SELECT p.dst AS state,
             |    CAST(sum((v.v_ppm * p.p_ppm) // 1000000) AS BIGINT)
             |      AS in_sum
             |  FROM p JOIN v${i - 1} v ON p.src = v.state GROUP BY 1),
             |v$i AS (SELECT n.state,
             |    coalesce(f.in_sum, 0) AS v_ppm
             |  FROM n LEFT JOIN f$i f USING (state))""".stripMargin
        }.mkString(",\n")
        Some(s"""WITH e AS (
          |  SELECT user_id, event_type, ts, event_id FROM events
          |  WHERE user_id IS NOT NULL),
          |tr AS (
          |  SELECT lag(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS src,
          |    event_type AS dst
          |  FROM e),
          |t AS (SELECT src, dst, count(*) AS cnt FROM tr
          |      WHERE src IS NOT NULL GROUP BY 1, 2),
          |n AS (SELECT src AS state FROM t UNION SELECT dst FROM t),
          |p AS (SELECT src, dst,
          |    CAST(cnt * 1000000 // sum(cnt) OVER (PARTITION BY src)
          |      AS BIGINT) AS p_ppm
          |  FROM t),
          |v0 AS (SELECT state,
          |    CAST(1000000 // (SELECT count(*) FROM n) AS BIGINT)
          |      AS v_ppm
          |  FROM n),
          |$iterCtes
          |SELECT state, v_ppm FROM v3
          |ORDER BY state""".stripMargin)
      }),

    // Multi-source BFS hop distances over the (sparsified) nation
    // trade graph: frontier expansion, each round one keyed join +
    // one anti-join against the settled set — the reachability
    // primitive transitive closure cannot afford (closure is
    // all-pairs). Unreached nations are absent by contract. The
    // oracle unrolls the identical 2 rounds.
    "q315_bfs_hops" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir).filter(col("l_quantity") <= 2)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        val edges = l
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .select(c("c_nationkey").as("src"), su("s_nationkey").as("dst"))
        Graph.bfsHops(edges, "src", "dst", sources = Seq(0L), maxHops = 2)
          .orderBy(col("node"))
      },
      Some("""WITH e AS (
        |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE l.l_quantity <= 2),
        |d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops),
        |n1 AS (SELECT DISTINCT e.dst AS node
        |  FROM e JOIN d0 ON e.src = d0.node
        |  WHERE e.dst NOT IN (SELECT node FROM d0)),
        |d1 AS (SELECT node, hops FROM d0
        |  UNION ALL SELECT node, CAST(1 AS BIGINT) FROM n1),
        |n2 AS (SELECT DISTINCT e.dst AS node
        |  FROM e JOIN n1 ON e.src = n1.node
        |  WHERE e.dst NOT IN (SELECT node FROM d1))
        |SELECT node, hops FROM (
        |  SELECT node, hops FROM d1
        |  UNION ALL SELECT node, CAST(2 AS BIGINT) FROM n2)
        |ORDER BY node""".stripMargin)),

    // Deterministic synchronous label propagation over a planted
    // community graph (50-node rings + sparse bridges): 3 rounds,
    // most-frequent-neighbor label with ties to the smallest — the
    // oracle unrolls the identical rounds with rank windows, so both
    // the frequency argmax AND the tie order are proven each round.
    "q352_label_propagation" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"))
        val ring = d.filter((col("doc_id") + 1) % 50 =!= 0)
          .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
          .join(d.select(col("doc_id").as("b")), Seq("b"))
        val bridge = d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("a"), (col("doc_id") + 50).as("b"))
          .join(d.select(col("doc_id").as("b")), Seq("b"))
        Graph.labelPropagation(ring.select(col("a"), col("b"))
            .union(bridge.select(col("a"), col("b"))), "a", "b",
            rounds = 3)
          .orderBy(col("node"))
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT doc_id AS a, doc_id + 1 AS b FROM ids
        |  WHERE (doc_id + 1) % 50 <> 0
        |    AND doc_id + 1 IN (SELECT doc_id FROM ids)
        |  UNION ALL
        |  SELECT doc_id, doc_id + 50 FROM ids
        |  WHERE doc_id % 97 = 0
        |    AND doc_id + 50 IN (SELECT doc_id FROM ids)),
        |e AS (SELECT DISTINCT a, b FROM (
        |    SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0)
        |  WHERE a <> b),
        |l0 AS (SELECT DISTINCT a AS node, a AS label FROM e),
        |r1 AS (SELECT a AS node, label FROM (
        |    SELECT e.a, l.label, count(*) AS c, row_number() OVER (
        |      PARTITION BY e.a ORDER BY count(*) DESC, l.label) AS rk
        |    FROM e JOIN l0 l ON e.b = l.node GROUP BY e.a, l.label)
        |  WHERE rk = 1),
        |r2 AS (SELECT a AS node, label FROM (
        |    SELECT e.a, l.label, count(*) AS c, row_number() OVER (
        |      PARTITION BY e.a ORDER BY count(*) DESC, l.label) AS rk
        |    FROM e JOIN r1 l ON e.b = l.node GROUP BY e.a, l.label)
        |  WHERE rk = 1),
        |r3 AS (SELECT a AS node, label FROM (
        |    SELECT e.a, l.label, count(*) AS c, row_number() OVER (
        |      PARTITION BY e.a ORDER BY count(*) DESC, l.label) AS rk
        |    FROM e JOIN r2 l ON e.b = l.node GROUP BY e.a, l.label)
        |  WHERE rk = 1)
        |SELECT node, label FROM r3 ORDER BY node""".stripMargin)),

    // Redirect resolution: ≤3-hop 301 chains (docs ≡ 0..2 mod 10
    // chain forward) plus planted 2-cycles (…97 ↔ …98 mod 100),
    // resolved in 3 pointer-doubling rounds. The oracle is the
    // CLOSED FORM of the chain arithmetic — the log-rounds algebra
    // must land on exactly the sequential-chase answer, cycles
    // flagged not chased.
    "q369_redirect_resolution" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"))
        val nxt = when(col("doc_id") % 100 === 97, col("doc_id") + 1)
          .when(col("doc_id") % 100 === 98, col("doc_id") - 1)
          .when(col("doc_id") % 10 < 3, col("doc_id") + 1)
        val edges = d.select(col("doc_id").as("src"), nxt.as("dst"))
          .filter(col("dst").isNotNull)
          .join(d.select(col("doc_id").as("dst")), Seq("dst"))
        Graph.resolveRedirects(d, edges, "doc_id", "src", "dst",
            rounds = 3)
          .orderBy(col("node"))
      },
      Some("""SELECT doc_id AS node,
        |  CASE WHEN doc_id % 100 IN (97, 98) THEN doc_id
        |       WHEN doc_id % 10 < 3 THEN doc_id - doc_id % 10 + 3
        |       ELSE doc_id END AS final_tgt,
        |  doc_id % 100 IN (97, 98) AS cyclic
        |FROM documents ORDER BY node""".stripMargin)),

    // TrustRank (seed-personalized PageRank): a 7-host ring + hub all
    // reachable from the two seed hosts, plus a 3-node spam clique
    // that links OUT to legit hosts but receives no in-links from the
    // trusted region — its trust stays exactly 0 through every round
    // (the spam-demotion property), while raw PageRank would pay it
    // the uniform teleport. Integer-ppm iteration, unrolled-CTE
    // oracle replay, bit-exact.
    "q372_trustrank" -> Q(
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir).select(col("doc_id"))
        val host = (o: Long) => concat(lit("host"),
          ((col("doc_id") + o) % 7).cast("string"), lit(".com"))
        val spam = (o: Long) => concat(lit("spam"),
          ((col("doc_id") + o) % 3).cast("string"), lit(".biz"))
        val edges = d.select(host(0).as("src"), host(3).as("dst"))
          .union(d.filter(col("doc_id") % 2 === 0)
            .select(host(0).as("src"), lit("hub.example.com").as("dst")))
          .union(d.filter(col("doc_id") % 11 === 0)
            .select(spam(0).as("src"), spam(1).as("dst")))
          .union(d.filter(col("doc_id") % 11 === 0)
            .select(spam(0).as("src"), host(0).as("dst")))
        val seeds = Seq("host0.com", "host1.com").toDF("node")
        Graph.trustRankPpm(edges, "src", "dst", seeds, "node", iters = 3)
          .orderBy(col("node"))
      },
      {
        val iterCtes = (1 to 3).map { i =>
          s"""f$i AS (SELECT e.dst AS node,
             |    CAST(sum(r.rank_ppm // d.out_deg) AS BIGINT) AS in_sum
             |  FROM e JOIN r${i - 1} r ON e.src = r.node
             |  JOIN d ON e.src = d.src GROUP BY e.dst),
             |r$i AS (SELECT b.node,
             |    CAST(b.base_ppm + (850000 * coalesce(f.in_sum, 0))
             |      // 1000000 AS BIGINT) AS rank_ppm
             |  FROM b LEFT JOIN f$i f USING (node))""".stripMargin
        }.mkString(",\n")
        Some(s"""WITH e AS (
          |  SELECT DISTINCT 'host' || (doc_id % 7) || '.com' AS src,
          |    'host' || ((doc_id + 3) % 7) || '.com' AS dst
          |  FROM documents
          |  UNION
          |  SELECT DISTINCT 'host' || (doc_id % 7) || '.com',
          |    'hub.example.com'
          |  FROM documents WHERE doc_id % 2 = 0
          |  UNION
          |  SELECT DISTINCT 'spam' || (doc_id % 3) || '.biz',
          |    'spam' || ((doc_id + 1) % 3) || '.biz'
          |  FROM documents WHERE doc_id % 11 = 0
          |  UNION
          |  SELECT DISTINCT 'spam' || (doc_id % 3) || '.biz',
          |    'host' || (doc_id % 7) || '.com'
          |  FROM documents WHERE doc_id % 11 = 0),
          |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |sd AS (SELECT unnest(['host0.com', 'host1.com']) AS node),
          |b AS (SELECT n.node,
          |    CAST(CASE WHEN sd.node IS NOT NULL THEN 150000 ELSE 0 END
          |      AS BIGINT) AS base_ppm
          |  FROM n LEFT JOIN sd USING (node)),
          |d AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
          |r0 AS (SELECT node,
          |    CAST(CASE WHEN base_ppm > 0 THEN 1000000 ELSE 0 END
          |      AS BIGINT) AS rank_ppm FROM b),
          |$iterCtes
          |SELECT node, rank_ppm FROM r3 ORDER BY node""".stripMargin)
      }),

    // Edge-weighted PageRank over the trade graph: flow proportional
    // to lineitem volume per (customer-nation → supplier-nation)
    // edge, not 1/out-degree — the anchor-count weighting a link
    // graph actually carries. Unrolled-CTE oracle, bit-exact ppm.
    "q396_weighted_pagerank" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        val edges = l
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .groupBy(c("c_nationkey").as("src"),
            su("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        Graph.pageRankWeightedPpm(edges, "src", "dst", "w", iters = 3)
          .select(col("node").cast("long").as("node"), col("rank_ppm"))
          .orderBy(col("node"))
      },
      {
        val iterCtes = (1 to 3).map { i =>
          s"""f$i AS (SELECT e.dst AS node,
             |    CAST(sum((r.rank_ppm * e.w) // d.w_out) AS BIGINT)
             |      AS in_sum
             |  FROM e JOIN r${i - 1} r ON e.src = r.node
             |  JOIN d ON e.src = d.src GROUP BY e.dst),
             |r$i AS (SELECT n.node,
             |    CAST(150000 + (850000 * coalesce(f.in_sum, 0)) // 1000000
             |      AS BIGINT) AS rank_ppm
             |  FROM n LEFT JOIN f$i f USING (node))""".stripMargin
        }.mkString(",\n")
        Some(s"""WITH e AS (
          |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
          |    count(*) AS w
          |  FROM lineitem l
          |  JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  GROUP BY 1, 2),
          |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |d AS (SELECT src, CAST(sum(w) AS BIGINT) AS w_out
          |  FROM e GROUP BY src),
          |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_ppm FROM n),
          |$iterCtes
          |SELECT CAST(node AS BIGINT) AS node, rank_ppm
          |FROM r3 ORDER BY node""".stripMargin)
      }),

    // Redirect-aware canonical dedup — q369 ∘ q367's axis: chains
    // resolve by pointer doubling, then every non-cyclic redirect
    // family collapses to its min-id member; cycle members keep
    // themselves (a cycle has no canonical). The oracle is the
    // chain arithmetic's CLOSED FORM plus the same group-min.
    "q394_redirect_canonical" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"))
        val nxt = when(col("doc_id") % 100 === 97, col("doc_id") + 1)
          .when(col("doc_id") % 100 === 98, col("doc_id") - 1)
          .when(col("doc_id") % 10 < 3, col("doc_id") + 1)
        val edges = d.select(col("doc_id").as("src"), nxt.as("dst"))
          .filter(col("dst").isNotNull)
          .join(d.select(col("doc_id").as("dst")), Seq("dst"))
        val res = Graph.resolveRedirects(d, edges, "doc_id", "src",
          "dst", rounds = 3)
        val keep = res.filter(!col("cyclic"))
          .groupBy(col("final_tgt")).agg(min(col("node")).as("keep_id"))
        res.join(keep, Seq("final_tgt"), "left")
          .select(col("node").as("doc_id"), col("final_tgt"),
            col("cyclic"),
            when(col("cyclic"), col("node")).otherwise(col("keep_id"))
              .as("keep_id"))
          .withColumn("is_dup",
            !col("cyclic") && col("keep_id") =!= col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id AS node,
        |    CASE WHEN doc_id % 100 IN (97, 98) THEN doc_id
        |         WHEN doc_id % 10 < 3 THEN doc_id - doc_id % 10 + 3
        |         ELSE doc_id END AS final_tgt,
        |    doc_id % 100 IN (97, 98) AS cyclic
        |  FROM documents),
        |k AS (SELECT final_tgt, min(node) AS keep_id
        |  FROM f WHERE NOT cyclic GROUP BY 1)
        |SELECT f.node AS doc_id, f.final_tgt, f.cyclic,
        |  CASE WHEN f.cyclic THEN f.node ELSE k.keep_id END AS keep_id,
        |  NOT f.cyclic AND k.keep_id <> f.node AS is_dup
        |FROM f LEFT JOIN k USING (final_tgt)
        |ORDER BY doc_id""".stripMargin)),

    // Related-term expansion: top-3 co-occurring terms per head term
    // by exact ppm lift (doc = basket), both directions of each
    // unordered pair — the query-expansion table a search stack
    // derives from q345/q152's lift algebra.
    "q395_related_terms" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val baskets = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(graft.operators.TextAnalysis.tokens(
              lower(col("text")))).as("tok"))
        val lift = Graph.cooccurrenceLift(baskets, "doc_id", "tok",
          minSupport = 5L)
        val sym = lift.select(col("item_a").as("head"),
            col("item_b").as("rel"), col("lift_ppm"))
          .union(lift.select(col("item_b").as("head"),
            col("item_a").as("rel"), col("lift_ppm")))
        sym.withColumn("rank", row_number().over(
            Window.partitionBy(col("head"))
              .orderBy(col("lift_ppm").desc, col("rel"))).cast("long"))
          .filter(col("rank") <= 3)
          .orderBy(col("head"), col("rank"))
      },
      Some("""WITH bi AS (
        |  SELECT DISTINCT doc_id AS b,
        |    unnest(CASE WHEN trim(lower(text)) = ''
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(trim(lower(text)), '\s+') END) AS i
        |  FROM documents),
        |tot AS (SELECT count(DISTINCT b) AS n_baskets FROM bi),
        |sz AS (SELECT i, count(*) AS n FROM bi GROUP BY 1),
        |p AS (SELECT x.i AS item_a, y.i AS item_b, count(*) AS n_ab
        |  FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |lf AS (SELECT p.item_a, p.item_b,
        |    (1000000 * p.n_ab * tot.n_baskets) // (a.n * c.n)
        |      AS lift_ppm
        |  FROM p JOIN sz a ON a.i = p.item_a
        |  JOIN sz c ON c.i = p.item_b CROSS JOIN tot),
        |sym AS (SELECT item_a AS head, item_b AS rel, lift_ppm FROM lf
        |  UNION ALL
        |  SELECT item_b, item_a, lift_ppm FROM lf),
        |r AS (SELECT head, rel, lift_ppm, row_number() OVER (
        |    PARTITION BY head ORDER BY lift_ppm DESC, rel) AS rank
        |  FROM sym)
        |SELECT head, rel, lift_ppm, rank FROM r WHERE rank <= 3
        |ORDER BY head, rank""".stripMargin)),

    // Sorted-neighborhood entity resolution (Hernández–Stolfo): rank
    // all part names in sort order, compare each to its 5 successors,
    // keep edit distance ≤ 4 — the blocking axis complementary to
    // q168 (token blocks miss pairs differing in the block token;
    // adjacency in sort order catches them). The Spark rank is the
    // bucketed global numbering (no data-sized window); the oracle
    // is the definitional single row_number.
    "q383_sorted_neighborhood" -> Q(
      (s, dir) => FuzzyMatch.sortedNeighborhoodMatch(
          Tables.part(s, dir), "p_name", nm => nm,
          window = 5, maxDist = 4)
        .orderBy(col("name_a"), col("name_b")),
      Some("""WITH n AS (SELECT DISTINCT p_name AS nm FROM part),
        |r AS (SELECT nm, row_number() OVER (ORDER BY nm) - 1 AS rn
        |      FROM n)
        |SELECT a.nm AS name_a, b.nm AS name_b,
        |  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist,
        |  b.rn - a.rn AS gap
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 5
        |WHERE levenshtein(a.nm, b.nm) <= 4
        |ORDER BY name_a, name_b""".stripMargin)),

    // k-core decomposition by iterative peeling (3 rounds, k = 90)
    // over the co-purchase graph: vertices below current-degree 90
    // drop with their edges each round, cascades included — shallow
    // structures unravel, the interlinked core survives. The oracle
    // unrolls the identical peel.
    "q384_kcore" -> Q(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = l.as("a")
          .join(l.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"),
            col("b.l_partkey").as("dst"))
        Graph.kCore(pairs, "src", "dst", k = 90, rounds = 3)
          .orderBy(col("node"))
      },
      {
        val peels = (1 to 3).map { i =>
          s"""k$i AS (SELECT u FROM e${i - 1} GROUP BY u
             |  HAVING count(*) >= 90),
             |e$i AS (SELECT e.u, e.v FROM e${i - 1} e
             |  JOIN k$i a ON e.u = a.u JOIN k$i b ON e.v = b.u)"""
            .stripMargin
        }.mkString(",\n")
        Some(s"""WITH e0 AS (
          |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          |  FROM lineitem a JOIN lineitem b
          |    ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey <> b.l_partkey),
          |$peels
          |SELECT u AS node, count(*) AS degree
          |FROM e3 GROUP BY 1 ORDER BY node""".stripMargin)
      })
  )
}
