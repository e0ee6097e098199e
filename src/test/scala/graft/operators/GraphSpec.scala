package graft.operators

import graft.SparkSpec

/** Planted-graph checks for the integer-ppm PageRank: hand-computed
  * ranks on a tiny digraph, dangling-node leakage, and the
  * iters=0 / duplicate-edge invariants.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankPpm(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("iters=0 leaves every node at the initial 1e6") {
    assert(ranks(Seq((1L, 2L), (2L, 3L)), 0) ===
      Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("one round on a 2-cycle is a fixed point") {
    // each node sends its whole rank to the other: in_sum = 1e6,
    // rank' = 150000 + 850000*1e6 div 1e6 = 1e6
    assert(ranks(Seq((1L, 2L), (2L, 1L)), 1) ===
      Map(1L -> 1000000L, 2L -> 1000000L))
    assert(ranks(Seq((1L, 2L), (2L, 1L)), 3) ===
      Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("hand-computed round on a fan-in with a dangling sink") {
    // 1→3, 2→3; 3 dangles. Round 1: node 3 in_sum = 1e6 + 1e6,
    // rank = 150000 + 850000*2e6 div 1e6 = 1850000; nodes 1, 2 get
    // no inflow: 150000. Round 2: 3 gets (150000 div 1) * 2 = 300000
    // → 150000 + 255000 = 405000; 1, 2 stay 150000.
    assert(ranks(Seq((1L, 3L), (2L, 3L)), 1) ===
      Map(1L -> 150000L, 2L -> 150000L, 3L -> 1850000L))
    assert(ranks(Seq((1L, 3L), (2L, 3L)), 2) ===
      Map(1L -> 150000L, 2L -> 150000L, 3L -> 405000L))
  }

  test("out-degree split uses floor division") {
    // 1→{2,3}: each successor receives 1e6 div 2 = 500000;
    // contributions of 2→1 and 3→1 give 1 an in_sum of 2e6.
    val r = ranks(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), 1)
    assert(r(2L) === 150000L + 850000L * 500000L / 1000000L)
    assert(r(1L) === 150000L + 850000L * 2000000L / 1000000L)
  }

  test("duplicate edges collapse before degree counting") {
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 2)
    val one = ranks(Seq((1L, 2L), (2L, 1L)), 2)
    assert(dup === one)
  }

  private def census(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Graph.triangleCount(edges.toDF("s", "d"), "s", "d").collect().head
  }

  test("triangleCount: K4 has 4 triangles and every wedge closed") {
    // complete graph on 4 nodes: 6 edges, C(4,3)=4 triangles. All
    // degrees tie at 3, so rank = id and out-neighbors are the
    // higher ids: 1→{2,3,4}, 2→{3,4}, 3→{4}; oriented wedges =
    // C(3,2)+C(2,2) = 4, every one closed
    val r = census(for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (6L, 4L, 4L, 1000000L))
  }

  test("triangleCount: reversed/duplicate/self edges canonicalize") {
    // triangle 1-2-3 written messily + a dangling edge 3-4
    val r = census(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 4L)))
    // edges {12,13,23,34}; degrees 1:2 2:2 3:3 4:1. Degree
    // orientation: 1→2 (tie, id), 1→3, 2→3, 4→3 — the hub 3 has
    // out-degree 0, so the ONLY wedge is 1's out-pair (2,3), closed
    // by 2→3. Raw-id wedges would have been 3; the refinement
    // enumerates 1 without losing the triangle.
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (4L, 1L, 1L))
  }

  test("triangleCount: triangle-free graph reports zero") {
    val r = census(Seq((1L, 2L), (3L, 4L)))
    assert((r.getLong(2), r.getLong(3)) === (0L, 0L))
  }

  test("itemSimilarityTopK: basket-set Jaccard, pairs only from co-occurrence") {
    import spark.implicits._
    // baskets: {A,B}, {A,B}, {A,C} → A:{1,2,3} B:{1,2} C:{3}
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (3L, "A") /* dup collapses */)
      .toDF("basket", "item")
    val got = Graph.itemSimilarityTopK(df, "basket", "item", k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // J(A,B) = 2/(3+2-2) = 2/3; J(A,C) = 1/(3+1-1) = 1/3; B-C never
    // share a basket → NO pair (co-occurrence blocking)
    assert(got === Map(
      ("A", "B") -> (2L, 3L, 2L, 666666L, 1L),
      ("A", "C") -> (1L, 3L, 1L, 333333L, 2L),
      ("B", "A") -> (2L, 2L, 3L, 666666L, 1L),
      ("C", "A") -> (1L, 1L, 3L, 333333L, 1L)))
  }

  test("cooccurrenceLift: exact ppm lift, minSupport prune, unordered pairs") {
    import spark.implicits._
    // 4 baskets: A+B together twice (lift > 1), A+C once (pruned at
    // minSupport=2), D alone (never pairs)
    val bi = Seq(
      ("b1", "A"), ("b1", "B"),
      ("b2", "A"), ("b2", "B"), ("b2", "B"), // dup item collapses
      ("b3", "A"), ("b3", "C"),
      ("b4", "D")).toDF("basket", "item")
    val got = Graph.cooccurrenceLift(bi, "basket", "item", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toMap
    // only (A,B): n_ab=2, n_a=3, n_b=2, N=4 → lift = 2·4/(3·2) = 4/3
    assert(got === Map(
      ("A", "B") -> ((2L, 3L, 2L, 4L, 1333333L))))
  }

  test("transitiveClosure equals brute-force chain walk on a deep path") {
    import spark.implicits._
    // a 20-deep path 1→2→…→20 plus a side branch: doubling must reach
    // distance 19 in ⌈log₂ 19⌉ = 5 rounds, far under maxRounds
    val edges = ((1 to 19).map(i => (i.toLong, i + 1L)) :+ (5L, 100L))
      .toDF("src", "dst")
    val got = Graph.transitiveClosure(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // expected: every (i, j) with i < j ≤ 20 at dist j - i, plus
    // (i, 100) for i ≤ 5 at dist 5 - i + 1
    val exp = (for { i <- 1 to 19; j <- (i + 1) to 20 }
      yield (i.toLong, j.toLong) -> (j - i).toLong).toMap ++
      (1 to 5).map(i => (i.toLong, 100L) -> (5 - i + 1).toLong).toMap
    assert(got === exp)
  }

  test("cooccurrenceLift: independence reads exactly 1e6 ppm") {
    import spark.implicits._
    // items X and Y occur in 2 of 4 baskets each, co-occur in 1:
    // lift = 1·4/(2·2) = 1.0 exactly
    val bi = Seq(
      ("b1", "X"), ("b1", "Y"),
      ("b2", "X"),
      ("b3", "Y"),
      ("b4", "Z")).toDF("basket", "item")
    val got = Graph.cooccurrenceLift(bi, "basket", "item", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(6))
      .toMap
    assert(got(("X", "Y")) === 1000000L)
  }

  test("bfsHops: shortest hop wins, maxHops cuts, unreached absent") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 3 -> 4 plus shortcut 0 -> 2; 9 -> 0 is upstream
    // (unreachable from 0); 5 is isolated
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L),
      (9L, 0L)).toDF("s", "d")
    val got = Graph.bfsHops(e, "s", "d", Seq(0L), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 via the shortcut is hop 1, NOT hop 2; 3 is hop 2; 4 is beyond
    // maxHops; 9 and 5 unreached -> absent
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    // multi-source: nearest source wins per node
    val multi = Graph.bfsHops(e, "s", "d", Seq(0L, 3L), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi(4L) === 1L && multi(2L) === 1L)
    // early exhaustion terminates before maxHops
    val tiny = Graph.bfsHops(Seq((7L, 8L)).toDF("s", "d"), "s", "d",
      Seq(7L), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny === Map(7L -> 0L, 8L -> 1L))
  }

  test("resolveRedirects: doubling depth, cycle entry, round budget") {
    import spark.implicits._
    // chain 1→…→9 (8 hops), cycle {20,21}, entry 19→20, isolate 30
    val edges = ((1L to 8L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 20L), (19L, 20L))).toDF("s", "d")
    val nodes = (Seq(30L) ++ (1L to 9L) ++ Seq(19L, 20L, 21L)).toDF("n")
    def run(r: Int) = Graph.resolveRedirects(nodes, edges, "n", "s",
        "d", rounds = r)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getBoolean(2)))).toMap
    val got = run(3) // 2^3 = 8 covers the chain exactly
    assert(got(1L) === ((9L, false)))
    assert(got(5L) === ((9L, false)))
    assert(got(30L) === ((30L, false)))   // never referenced: terminal
    assert(got(19L)._2 && got(20L)._2 && got(21L)._2) // cycle + entry
    // under-provisioned rounds: the 8-hop chain can't terminate in
    // 2^2 = 4 hops → conservatively flagged, never a wrong terminal
    val short = run(2)
    assert(short(1L)._2 === true)
    assert(short(5L) === ((9L, false))) // 4 remaining hops still fit
  }

  test("kCore: peel cascades down a chain, core survives intact") {
    import spark.implicits._
    // K4 core {1,2,3,4} with a chain 4—5—6: k=2 round 1 drops 6
    // (deg 1), round 2 drops 5 (now deg 1), round 3 drops the 4—5
    // stub's effect — core degrees return to 3 at node 4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("s", "d")
    def run(r: Int) = Graph.kCore(edges, "s", "d", k = 2, rounds = r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(0).keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(run(1).keySet === Set(1L, 2L, 3L, 4L, 5L)) // 6 peeled
    assert(run(2) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(run(3) === run(2)) // converged: rounds bound work only
    // duplicate/reversed/self edges canonicalize before peeling
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("s", "d")
    assert(Graph.kCore(messy, "s", "d", k = 2, rounds = 1)
      .collect().map(_.getLong(1)).toSet === Set(2L))
  }

  test("trustRankPpm: spam cluster unreachable from seeds scores 0") {
    import spark.implicits._
    // trusted pair 1→2→1, plus spam pair 10↔11 that links OUT to 1
    // but receives nothing from the trusted side
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L),
      (10L, 1L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.trustRankPpm(edges, "s", "d", seeds, "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // spam nodes: base 0 and zero trusted inflow every round
    assert(got(10L) === 0L && got(11L) === 0L)
    // node 2's only inflow is node 1 (out_deg 1): r1(2) = 0 + .85*1e6
    assert(got(2L) > 0L)
    // seed keeps its teleport share every round
    assert(got(1L) >= 150000L)
    // iters=0: seeds at 1e6, everyone else 0
    val r0 = Graph.trustRankPpm(edges, "s", "d", seeds, "node", 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 === Map(1L -> 1000000L, 2L -> 0L, 10L -> 0L, 11L -> 0L))
    // seeds absent from the edge set contribute nothing and emit no row
    val g2 = Graph.trustRankPpm(edges, "s", "d",
        Seq(99L).toDF("node"), "node", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!g2.contains(99L) && g2.values.forall(_ === 0L))
  }

  test("labelPropagation: majority wins, ties to smallest, sync rounds") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4—3; round 1: every triangle node
    // sees two labels → tie → min; pendant adopts 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a", "b")
    val r1 = Graph.labelPropagation(edges, "a", "b", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
    // round 2 from that state: node 1 nbrs {2→1,3→1} → 1; node 2 nbrs
    // {1→2,3→1} tie → 1; node 3 nbrs {1→2,2→1,4→3} tie → 1; node 4
    // nbr {3→1} → 1 — consensus on label 1
    val r2 = Graph.labelPropagation(edges, "a", "b", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // rounds = 0 is the identity labeling
    val r0 = Graph.labelPropagation(edges, "a", "b", rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }
}
