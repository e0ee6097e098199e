package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over an edge list — the corpus-curation
  * use is domain authority (PageRank over the crawl link graph) as a
  * quality prior when sampling a training mixture.
  *
  * Same distributed-iteration discipline as
  * [[Dedup.dedupGroups]]: per round one equi-join + one partial
  * aggregation, `localCheckpoint` lineage truncation, and the driver
  * only ever sees counters — never node- or edge-sized state. All
  * rank arithmetic is INTEGER (ppm units, floor division), so every
  * round is order-free and bit-identical across engines and
  * partitionings — the property that lets a SQL oracle replay the
  * iteration exactly.
  */
object Graph {

  /** `iters` rounds of damped PageRank in integer ppm units.
    *
    * Semantics (the classic unnormalized form):
    *  - nodes = distinct endpoints of `edges` (either side);
    *  - rank⁰ = 1 000 000 per node;
    *  - rankⁱ = (1e6 − damp) + (damp · Σ_{(s→n)} rankⁱ⁻¹(s) div
    *    out_deg(s)) div 1e6 — floor division at both steps keeps every
    *    intermediate a BIGINT;
    *  - dangling nodes (no out-edges) leak their mass — the simple
    *    variant; the redistribution refinement would be one extra
    *    1-row aggregate per round.
    *
    * Scale: edges are deduped once (one shuffle), then each round is a
    * shuffle join of edges against the k-node rank frame plus a
    * partial agg on dst — linear per round, no driver state. For a
    * power-law web graph the dst agg is the skew point; AQE's skew
    * handling or a two-level pre-agg on (dst, salt) drops in without
    * changing semantics (sum is associative).
    */
  def pageRankPpm(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 0 && dampPpm >= 0 && dampPpm <= 1000000L)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    // nodes is consumed by EVERY round's rank update — checkpoint it
    // (node-grain, bounded) or each round re-derives it from the
    // caller's edge pipeline (q353's regex link extraction re-ran
    // once per iteration, optimization r15)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    // the degree-annotated edge list is loop-INVARIANT: materialize it
    // once (localCheckpoint) instead of re-running the upstream joins
    // + distinct every round — at web-graph scale the edge derivation
    // dwarfs the per-round work
    val withDeg = e.join(deg, "src").localCheckpoint()
    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank_ppm div out_deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(1000000L - dampPpm) +
            expr(s"($dampPpm * coalesce(in_sum, 0L)) div 1000000"))
            .as("rank_ppm"))
        .localCheckpoint()
    }
    rank
  }

  /** Edge-weighted PageRank: mass flows proportional to edge weight
    * (anchor counts, click counts) instead of 1/out_degree —
    * contribution per edge = ⌊rank·w / w_out⌋ with w_out the source's
    * total outgoing weight. Same integer-ppm discipline and per-round
    * shape as [[pageRankPpm]]; duplicate (src, dst) rows must be
    * pre-aggregated by the caller (weights are taken as given, not
    * deduped — collapsing them is a semantic choice).
    */
  def pageRankWeightedPpm(edges: DataFrame, srcCol: String,
      dstCol: String, wCol: String, iters: Int,
      dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 0 && dampPpm >= 0 && dampPpm <= 1000000L)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
    // checkpointed for the same per-round reuse as [[pageRankPpm]]
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val wout = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val withW = e.join(wout, "src").localCheckpoint()
    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
    for (_ <- 1 to iters) {
      val inflow = withW
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(rank_ppm * w) div w_out").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(1000000L - dampPpm) +
            expr(s"($dampPpm * coalesce(in_sum, 0L)) div 1000000"))
            .as("rank_ppm"))
        .localCheckpoint()
    }
    rank
  }

  /** TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB'04): PageRank
    * with the teleport vector RESTRICTED to a hand-vetted seed set of
    * trusted nodes, so authority flows outward from the seeds and
    * spam farms — which can manufacture in-links but not seed
    * membership — score near zero. The crawl-curation use is a
    * quality prior complementary to raw PageRank (q327): sample or
    * boost by trust, demote unreachable-from-seed link clusters.
    *
    * Same integer-ppm discipline as [[pageRankPpm]] so the unrolled
    * CTE oracle replays bit-exactly:
    *  - rank⁰ = 10⁶ for seed nodes, 0 otherwise;
    *  - rankⁱ = (seed ? 10⁶−damp : 0) + (damp · Σ inflow) div 10⁶,
    *    inflow per edge = rankⁱ⁻¹(src) div out_deg(src).
    * Seeds not present in the edge set are ignored (they have no
    * edges to flow through); dangling mass leaks as in the simple
    * PageRank variant.
    *
    * Scale: `seeds` is a curated list — tiny by construction — so its
    * membership join broadcasts; per round the same edge join +
    * dst-keyed partial agg as PageRank, no driver state.
    */
  def trustRankPpm(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int,
      dampPpm: Long = 850000L): DataFrame = {
    require(iters >= 0 && dampPpm >= 0 && dampPpm <= 1000000L)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seed = broadcast(
      seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("__seed", lit(1)))
    val base = nodes.join(seed, Seq("node"), "left")
      .select(col("node"),
        when(col("__seed").isNotNull, lit(1000000L - dampPpm))
          .otherwise(lit(0L)).as("base_ppm"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val withDeg = e.join(deg, "src").localCheckpoint()
    var rank = base.select(col("node"),
      when(col("base_ppm") > 0, lit(1000000L)).otherwise(lit(0L))
        .as("rank_ppm"))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank_ppm div out_deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      rank = base.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (col("base_ppm") +
            expr(s"($dampPpm * coalesce(in_sum, 0L)) div 1000000"))
            .as("rank_ppm"))
        .localCheckpoint()
    }
    rank
  }

  /** Triangle census of an undirected graph, degree-oriented (the
    * Suri–Vassilvitskii "forward" refinement): edges canonicalize to
    * u < v (self-loops dropped, both directions collapsed), then each
    * edge directs from its lower-(degree, id) endpoint to the higher
    * — so wedges enumerate as PAIRS OF OUT-EDGES of a shared pivot,
    * and every wedge pivots at its LOWEST-rank vertex. Out-degree
    * under this orientation is O(√m) even on power-law graphs, which
    * cuts the wedge join from Σd² of the hubs (the raw-id
    * formulation's quadratic term) to near-linear — the difference
    * between a census that survives a social graph and one that
    * dies on its first celebrity node. A triangle closes exactly one
    * wedge (the one pivoted at its lowest-rank corner, with the
    * out-neighbors ordered by the same rank), so the closing probe is
    * a single directed-edge join and n_triangles needs no dedup.
    *
    * Returns one row: (n_edges, n_wedges, n_triangles, closed_ppm) —
    * closure in integer ppm (floor division, oracle-exact). n_wedges
    * follows the orientation (only lowest-rank-pivot wedges are
    * enumerated); n_triangles is orientation-invariant.
    *
    * Scale: one degree agg + two node-keyed degree joins (node table
    * ≪ edges — AQE broadcasts it), one adjacency agg (per-node lists
    * bounded by the O(√m) oriented out-degree) and one edge-keyed
    * intersection pass — wedges are COUNTED (Σ C(d_o, 2)), never
    * materialized or shuffled (optimization r15). No driver state.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    // e feeds the degree agg, both orientation joins, and the edge
    // count; o feeds both wedge sides and the closing probe — persist
    // each so the (possibly expensive) edge derivation runs once per
    // action instead of once per consumer. Blocks free via the
    // ContextCleaner when the frames go unreachable (q214 pattern).
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    // orient low-(deg, id) → high; canonical u < v breaks degree ties
    val lowerIsU = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = e
      .join(deg.select(col("n").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), Seq("v"))
      .select(
        when(lowerIsU, col("u")).otherwise(col("v")).as("s"),
        when(lowerIsU, col("v")).otherwise(col("u")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EDGE-ITERATOR census (optimization r15, guide §2.3/§8): the
    // wedge self-join materialized and SHUFFLED every wedge row
    // (Σ C(d_o, 2) rows — tens of millions on the dense co-purchase
    // graph) just to probe which close. Identical counts come cheaper:
    //  - n_wedges = Σ_s C(outdeg_o(s), 2) exactly (the old join's
    //    strict (td, t) ordering enumerated each unordered out-edge
    //    pair once — t is unique per s, so the order was total);
    //  - each triangle {s→a, s→c, a→c} is found EXACTLY once at its
    //    edge (s, a) as c ∈ N⁺(s) ∩ N⁺(a) (the pivot's other edge
    //    s→c and the closing edge a→c both point "up" the (deg, id)
    //    order), so n_triangles = Σ_(s,t)∈o |N⁺(s) ∩ N⁺(t)| — one
    //    sorted-adjacency intersection per edge, no wedge rows at all.
    // eager checkpoint: adj feeds three consumers (the scalar census
    // broadcast + both intersection joins) whose broadcast-future
    // threads would otherwise RACE the first materialization of the
    // e→o→adj chain and compute it 2–3× in parallel
    val adj = o.groupBy(col("s"))
      .agg(sort_array(collect_list(col("t"))).as("nb"),
        count(lit(1)).as("d"))
      .localCheckpoint(true)
    // n_edges = Σ d (o is a 1:1 reorientation of e), n_wedges =
    // Σ C(d, 2) — one bounded agg over adj, no second scan of e
    val census = adj
      .agg(coalesce(sum(col("d")).cast("long"), lit(0L)).as("n_edges"),
        coalesce(sum(expr("d * (d - 1) div 2")), lit(0L))
          .as("n_wedges"))
    val tri = o
      .join(adj.select(col("s"), col("nb").as("__ns")), Seq("s"))
      .join(adj.select(col("s").as("t"), col("nb").as("__nt")),
        Seq("t"), "left")
      .select(when(col("__nt").isNull, lit(0))
        .otherwise(size(array_intersect(col("__ns"), col("__nt"))))
        .as("__c"))
      // sum over ZERO edges is null; the census must read 0 (the
      // oracle's count() does)
      .agg(coalesce(sum(col("__c")).cast("long"), lit(0L))
        .as("n_triangles"))
    tri
      .crossJoin(broadcast(census))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("(1000000 * n_triangles) div n_wedges"))
          .otherwise(lit(0L)).as("closed_ppm"))
  }

  /** Item-item collaborative filtering, co-occurrence flavor
    * ("customers who bought X also bought Y"): items sharing a basket
    * pair up, similarity = Jaccard of their basket SETS in exact
    * integer ppm, and each item keeps its top-k neighbors by
    * (similarity desc, neighbor asc). The candidate generation is the
    * basket self-join — item pairs arise ONLY from co-occurrence,
    * never item × item — and the pair count per basket is C(basket
    * size, 2): bounded by basket width, not catalog size, the same
    * blocking argument as LSH banding. Per-item top-k is one
    * group-bounded window.
    *
    * Input: (basketCol, itemCol) event rows (duplicates collapse).
    * Output: (item, neighbor, n_common, n_item, n_neighbor,
    * jaccard_ppm, rank), rank ≤ k.
    *
    * Scale: distinct → one basket-keyed self-join → pair agg →
    * size join (item-grain frame, AQE-broadcastable) → window.
    * A pathological mega-basket (one order holding the catalog)
    * needs an upstream basket-size cap — same hot-key discipline as
    * capping LSH buckets.
    */
  def itemSimilarityTopK(events: DataFrame, basketCol: String,
      itemCol: String, k: Int): DataFrame = {
    require(k > 0)
    val bi = events.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = bi.groupBy(col("i")).agg(count(lit(1)).as("sz"))
    val pairs = bi.as("x")
      .join(bi.as("y"), col("x.b") === col("y.b") &&
        col("x.i") =!= col("y.i"))
      .groupBy(col("x.i").as("item"), col("y.i").as("neighbor"))
      .agg(count(lit(1)).as("n_common"))
    val scored = pairs
      .join(sizes.select(col("i").as("item"), col("sz").as("n_item")),
        Seq("item"))
      .join(sizes.select(col("i").as("neighbor"),
        col("sz").as("n_neighbor")), Seq("neighbor"))
      .withColumn("jaccard_ppm",
        expr("(1000000 * n_common) div (n_item + n_neighbor - n_common)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("jaccard_ppm").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_common"),
        col("n_item"), col("n_neighbor"), col("jaccard_ppm"), col("rank"))
  }

  /** Transitive closure of a DAG edge set by ITERATIVE DOUBLING —
    * Spark's substitute for the recursive CTE it lacks (the
    * hierarchy-flattening query: org charts, category trees, folder
    * ancestry). Squaring the path set (R ∪ R∘R per round) reaches
    * paths of length 2^k after k rounds, so a depth-d hierarchy needs
    * ⌈log₂ d⌉ joins — not d self-joins like naive expansion; the same
    * O(log) trick as [[graft.operators.Dedup.dedupGroupsLogRounds]].
    * Convergence is checked by exact path count (safe: the set only
    * grows), lineage is truncated per round, and on a DAG the
    * (src, dst, min dist) triple is deterministic.
    */
  def transitiveClosure(edges: DataFrame, srcCol: String,
      dstCol: String, maxRounds: Int = 16): DataFrame = {
    var paths = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .withColumn("dist", lit(1L))
      .localCheckpoint(true)
    var n = paths.count()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val hop = paths.as("a")
        .join(paths.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"),
          (col("a.dist") + col("b.dist")).as("dist"))
      paths = paths.unionByName(hop)
        .groupBy(col("src"), col("dst"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      val n2 = paths.count()
      converged = n2 == n
      n = n2
      round += 1
    }
    require(converged, s"closure did not converge in $maxRounds rounds")
    paths
  }

  /** Multi-source BFS hop distances — the frontier-expansion primitive
    * [[transitiveClosure]] deliberately is not: closure materializes
    * ALL-PAIRS reachability (quadratic in the worst case), while BFS
    * from a source set touches each reachable node once, so
    * "distance from the seed domains / the flagged account" runs on
    * graphs where closure cannot. Per round: frontier ⋈ edges (one
    * keyed shuffle), distinct, anti-join against the settled set,
    * `localCheckpoint` truncation — work is frontier-bounded, driver
    * sees only a counter. Unreached nodes are absent (no sentinel
    * rows — callers outer-join if they need ∞).
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], maxHops: Int): DataFrame = {
    require(sources.nonEmpty && maxHops >= 0)
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    var dist = sources.distinct.toDF("node")
      .withColumn("hops", lit(0L)).localCheckpoint(true)
    var frontier = dist.select(col("node"))
    var h = 0L
    var exhausted = false
    while (h < maxHops && !exhausted) {
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hops", lit(h + 1L))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        dist = dist.unionByName(next).localCheckpoint(true)
        frontier = next.select(col("node"))
      }
      h += 1
    }
    dist
  }

  /** Basket co-occurrence LIFT mining (association rules without the
    * Apriori lattice — the pair grain is enough for affinity
    * readouts): for every unordered item pair, support n_ab and
    * lift = P(a,b)/(P(a)·P(b)) = n_ab·N/(n_a·n_b) as exact integer
    * ppm by cross-multiplied division. Lift > 1e6 ppm means the pair
    * co-occurs MORE than independence predicts.
    *
    * Plan shape: distinct (basket, item) rides one shuffle; pairs
    * come from a basket-keyed self-join bounded by Σ|basket|² (cap
    * basket width upstream for pathological baskets — the q227
    * discipline); sizes and the one-row basket total broadcast onto
    * the pair frame. `minSupport` prunes the long noise tail before
    * the readout. Integer range: 1e6·n_ab·N stays in BIGINT while
    * n_ab·N < 9.2e12 — beyond that (trillions of baskets) move the
    * product to DECIMAL(38,0); the gate pins today's exact algebra.
    */
  def cooccurrenceLift(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = bi.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val sizes = bi.groupBy(col("i")).agg(count(lit(1)).as("n"))
    val pairs = bi.as("x")
      .join(bi.as("y"), col("x.b") === col("y.b") &&
        col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(sizes.select(col("i").as("item_a"), col("n").as("n_a")),
        Seq("item_a"))
      .join(sizes.select(col("i").as("item_b"), col("n").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(total)) // one-row scalar attach
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        expr("(1000000 * n_ab * n_baskets) div (n_a * n_b)").as("lift_ppm"))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * distributed formulation of Montresor et al.): each round drops
    * every vertex whose CURRENT degree is below `k`, together with
    * its edges — peeling cascades, so a chain of degree-k vertices
    * hanging off the core unravels one link per round. After `rounds`
    * applications the surviving subgraph is returned as (node,
    * degree); when no round removed anything the result IS the k-core
    * (callers size `rounds` to the expected peel depth — each round
    * strictly shrinks the graph or the iteration has converged, so
    * `rounds` bounds work, never correctness of what remains).
    *
    * The corpus-curation use: spam link farms and template clusters
    * form shallow structures that peel away, while genuinely
    * interlinked hubs survive — a robust complement to
    * [[trustRankPpm]]'s seed-reachability view.
    *
    * Scale: edges canonicalize + symmetrize once; per round one
    * degree partial agg + two semi-join-shaped keeps, localCheckpoint
    * truncating lineage — counters only, no driver state.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 0)
    // canonicalize BEFORE the distinct, mirror after (optimization
    // r15, guide §2.3): dedup runs over |E| canonical rows instead of
    // the 2|E| symmetrized form, and the mirror of a distinct
    // canonical set needs no second dedup — the two orientations are
    // disjoint by construction. Same symmetric edge set, half the
    // dedup shuffle.
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .filter(col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("u"),
        greatest(col("__a"), col("__b")).as("v"))
      .distinct().localCheckpoint()
    var e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    for (_ <- 1 to rounds) {
      // checkpoint the survivor set: the u-side and v-side joins
      // build two DIFFERENT broadcast relations from it, and without
      // truncation each would re-run the full-edge degree agg
      // (optimization r15, guide §5)
      val keep = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u"))
        .localCheckpoint(true)
      e = e.join(keep, Seq("u"))
        .join(keep.withColumnRenamed("u", "v"), Seq("v"))
        .select(col("u"), col("v")).localCheckpoint()
    }
    e.groupBy(col("u")).agg(count(lit(1)).as("degree"))
      .select(col("u").as("node"), col("degree"))
  }

  /** Stationary distribution of a Markov chain (user-journey
    * transition graph) by integer-ppm power iteration: per round
    * v'_j = Σ_i ⌊v_i·p_ij / 10⁶⌋ with row-stochastic p in ppm
    * (⌊cnt·10⁶ / row_sum⌋). Floor twice per edge keeps every round
    * in BIGINT so the unrolled-CTE oracle replays bit-exactly (the
    * [[pageRankPpm]] discipline; the ~state-count ppm lost to floors
    * per round is the price of a gateable chain). Transition and
    * state frames are state-bounded; per round one edge join + one
    * state-keyed agg.
    */
  def markovStationaryPpm(transitions: DataFrame, srcCol: String,
      dstCol: String, cntCol: String, iters: Int): DataFrame = {
    require(iters >= 1)
    val t = transitions.select(col(srcCol).as("src"),
      col(dstCol).as("dst"), col(cntCol).as("cnt"))
    val states = t.select(col("src").as("state"))
      .union(t.select(col("dst").as("state"))).distinct()
      .localCheckpoint(true)
    val nStates = states.count()
    // empty transition frame would divide by zero building the
    // uniform start vector — fail with intent, not ArithmeticException
    require(nStates > 0,
      "markovStationaryPpm: transitions frame is empty (no states)")
    // NOTE: states with no outgoing edges are SINKS — the ppm matrix
    // is sub-stochastic at those rows, so their mass drains each
    // round rather than self-looping. This matches the unrolled-CTE
    // oracle exactly (both engines drain identically); callers who
    // want a proper stationary distribution should add explicit
    // self-loop transitions for absorbing states before calling.
    val p = t
      .withColumn("__row",
        sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .withColumn("p_ppm", expr("cnt * 1000000L div __row"))
      .select(col("src"), col("dst"), col("p_ppm"))
      .localCheckpoint(true)
    var v = states.withColumn("v_ppm", lit(1000000L / nStates))
    for (_ <- 1 to iters) {
      val inflow = p
        .join(v.withColumnRenamed("state", "src"), "src")
        .select(col("dst").as("state"),
          expr("(v_ppm * p_ppm) div 1000000L").as("c"))
        .groupBy(col("state")).agg(sum(col("c")).as("in_sum"))
      v = states.join(inflow, Seq("state"), "left")
        .select(col("state"),
          coalesce(col("in_sum"), lit(0L)).as("v_ppm"))
        .localCheckpoint(true)
    }
    v
  }

  /** HITS hubs & authorities in integer ppm ([[pageRankPpm]]'s
    * discipline applied to Kleinberg's mutual-reinforcement pair):
    * per round, auth ← Σ hub over in-edges then hub ← Σ (new) auth
    * over out-edges, each rescaled to max = 10⁶ by integral div — the
    * max-norm replaces the classic L2 norm so the whole iteration
    * stays in BIGINT and the unrolled-CTE oracle replays it
    * bit-exactly (a float norm could never hash-gate). Per round: two
    * edge-keyed join+agg pairs plus two 1-row max attaches; the
    * edge list is loop-invariant (localCheckpoint once); rank frames
    * are node-bounded. Nodes without in-(out-)edges settle at auth
    * (hub) 0, isolated-side-safe via the left join + coalesce.
    */
  /** Synchronous label propagation (Raghavan et al. 2007's LPA in
    * its deterministic batch form) — the community-detection member
    * of the graph family: every node starts as its own label; each
    * round, every node adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label, isolated nodes keep
    * their own. Fixed round count + total tie order make the run
    * hash-reproducible (async/random LPA is not).
    *
    * Per round: one edge⋈label join and two partial aggs — the
    * argmax is min(struct(−count, label)), never a data window. The
    * undirected edge frame is loop-invariant and localCheckpointed
    * once, the [[pageRankPpm]] discipline.
    */
  def labelPropagation(edges: DataFrame, srcCol: String,
      dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val und = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val nodes = und.select(col("a").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val nbr = und
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("a"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l")))
          .as("best"))
        .select(col("a").as("node"), col("best.l").as("label"))
      labels = labels.select(col("node"))
        .join(nbr, Seq("node"), "left")
        // isolated nodes never occur here (every node has an edge by
        // construction of `nodes`), but keep the coalesce so callers
        // passing a custom node frame degrade safely
        .withColumn("label", coalesce(col("label"), col("node")))
        .localCheckpoint()
    }
    labels
  }

  /** Redirect-chain resolution by POINTER DOUBLING — the functional-
    * graph cousin of the large/small-star components: every node
    * follows its single out-edge (its 301 target; absent = terminal,
    * self-mapped), and each round substitutes f ← f∘f, so a chain of
    * length L resolves in ⌈log₂ L⌉ rounds instead of L sequential
    * lookups — the difference between 3 and 40 shuffles on real
    * redirect data. Cycles are detected, not chased: doubling drives
    * a cycle node to a FIXED representative, and the final
    * `cyclic` flag is simply "my resolved target still has an
    * out-edge pointing elsewhere" (a true terminal never does).
    * Chains ENTERING a cycle flag too (they resolve to some cycle
    * member). Provision `rounds` so 2^rounds ≥ the longest expected
    * chain: an under-provisioned walk reports unresolved chains as
    * cyclic — conservative ("did not terminate"), never silently
    * wrong. Per-round localCheckpoint, counters-only driver — the
    * [[graft.operators.Dedup.dedupGroups]] discipline.
    */
  def resolveRedirects(nodes: DataFrame, edges: DataFrame,
      nodeCol: String, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col(srcCol).as("node"), col(dstCol).as("__t"))
    val all = nodes.select(col(nodeCol).as("node"))
      .union(e.select(col("node")))
      .union(edges.select(col(dstCol).as("node"))).distinct()
    var f = all.join(e, Seq("node"), "left")
      .select(col("node"), coalesce(col("__t"), col("node")).as("tgt"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      f = f.join(f.select(col("node").as("tgt"),
          col("tgt").as("__t2")), Seq("tgt"))
        .select(col("node"), col("__t2").as("tgt"))
        .localCheckpoint()
    }
    f.join(e.select(col("node").as("tgt"), col("__t").as("__out")),
        Seq("tgt"), "left")
      .select(col("node"), col("tgt").as("final_tgt"),
        (col("__out").isNotNull && col("__out") =!= col("tgt"))
          .as("cyclic"))
  }

  def hitsPpm(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    def rescale(raw: DataFrame, out: String): DataFrame = {
      val mx = raw.agg(greatest(max(col("raw")), lit(1L)).as("__mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          expr("(1000000 * coalesce(raw, 0L)) div __mx").as(out))
    }
    var hub = nodes.withColumn("hub_ppm", lit(1000000L))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = e
        .join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hub_ppm")).as("raw"))
      auth = rescale(authRaw, "auth_ppm").localCheckpoint()
      val hubRaw = e
        .join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("auth_ppm")).as("raw"))
      hub = rescale(hubRaw, "hub_ppm").localCheckpoint()
    }
    auth.join(hub, Seq("node"))
  }
}
