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
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
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
}
