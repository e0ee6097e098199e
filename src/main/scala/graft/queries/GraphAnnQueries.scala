package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.{GraphAnn, Similarity}
import graft.expressions.VectorExpressions.dotI

/** q451–q452, q457–q458: graph-based ANN (NN-descent build,
  * beam-search serve, incremental insert, delete/repair) over int8
  * codes. The oracles replay
  * EVERYTHING — the int8 quantization (q109's trunc discipline), the
  * k salted hash rings, every NN-descent round (undirected
  * co-neighbor candidates → integer-dot score → top-k window), the
  * beam expansion steps, the insert's reverse-edge re-rank, and the
  * exact brute-force audit — as chained materialized CTEs, so the
  * full build, serve AND maintenance paths hash-gate cross-engine.
  */
object GraphAnnQueries extends QueryPack {

  private val K = 4 // graph degree
  private val Buckets = 8 // ring hash buckets (size: bucket ≤ task)
  private val Rounds = 3 // NN-descent rounds
  private val EntryK = 8 // beam entry points
  private val Beam = 12
  private val Steps = 5
  private val TopK = 3

  /** Exact integer dot of two BIGINT lists — the [[dotI]] mirror
    * (q126's fold shape).
    */
  private def idotSql(a: String, b: String): String =
    s"CAST(list_reduce([CAST(0 AS BIGINT)] || " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), " +
      s"(acc, x) -> acc + x) AS BIGINT)"

  /** [[GraphAnn.saltedHash60]] mirror. */
  private def hashSql(idExpr: String, salt: String): String =
    s"CAST(('0x' || substr(md5(CAST($idExpr AS VARCHAR) || '$salt'), " +
      s"1, 15)) AS BIGINT)"

  /** int8 codes of every embedding — q109's quantization replay. */
  private val codesCte: String =
    """mz AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding,
      |      x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      |  FROM embeddings),
      |qz AS MATERIALIZED (
      |  SELECT vec_id,
      |    CASE WHEN maxabs = 0
      |         THEN list_transform(range(1, len(embedding) + 1),
      |                i -> CAST(0 AS BIGINT))
      |         ELSE list_transform(range(1, len(embedding) + 1),
      |                i -> CAST(trunc(CAST(embedding[i] AS DOUBLE)
      |                       / (maxabs / 127.0)) AS BIGINT))
      |    END AS q
      |  FROM mz)""".stripMargin

  /** Ring init + `Rounds` NN-descent rounds over the nodes matching
    * `cond`, ending in the edge CTE `e$Rounds(src, dst)` — ONE
    * builder shared by all three gates so the build replay can never
    * drift between them.
    */
  private def graphCtes(cond: String): String = {
    val rings = (1 to K).map { j =>
      s"""rj$j AS (SELECT vec_id, h, h % $Buckets AS b FROM (
         |  SELECT vec_id, ${hashSql("vec_id", s":ring$j")} AS h
         |  FROM qz WHERE $cond)),
         |rk$j AS MATERIALIZED (SELECT vec_id, b,
         |    row_number() OVER (PARTITION BY b ORDER BY h, vec_id) AS r,
         |    count(*) OVER (PARTITION BY b) AS c
         |  FROM rj$j),
         |ed$j AS (SELECT a.vec_id AS src, bb.vec_id AS dst
         |  FROM rk$j a JOIN rk$j bb
         |    ON a.b = bb.b AND bb.r = a.r % a.c + 1)""".stripMargin
    }.mkString(",\n")
    val unionEd = (1 to K).map(j => s"SELECT * FROM ed$j")
      .mkString(" UNION ALL ")
    val rounds = (1 to Rounds).map { r =>
      s"""und$r AS MATERIALIZED (
         |  SELECT src, dst FROM e${r - 1}
         |  UNION
         |  SELECT dst AS src, src AS dst FROM e${r - 1}),
         |pr$r AS (SELECT a.dst AS u, b.dst AS w
         |  FROM und$r a JOIN und$r b
         |    ON a.src = b.src AND a.dst < b.dst),
         |cd$r AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM e${r - 1}
         |  UNION ALL SELECT u AS src, w AS dst FROM pr$r
         |  UNION ALL SELECT w AS src, u AS dst FROM pr$r)
         |  WHERE src <> dst),
         |sc$r AS (SELECT c.src, c.dst,
         |    ${idotSql("qs.q", "qd.q")} AS idot
         |  FROM cd$r c JOIN qz qs ON qs.vec_id = c.src
         |              JOIN qz qd ON qd.vec_id = c.dst),
         |e$r AS MATERIALIZED (SELECT src, dst FROM (
         |  SELECT src, dst, row_number() OVER (PARTITION BY src
         |      ORDER BY idot DESC, dst) AS rn
         |  FROM sc$r) WHERE rn <= $K)""".stripMargin
    }.mkString(",\n")
    s"""$codesCte,
       |$rings,
       |e0 AS MATERIALIZED (SELECT DISTINCT src, dst
       |  FROM ($unionEd) WHERE src <> dst),
       |$rounds""".stripMargin
  }

  /** Beam search as CTEs: queries from `qCte(query_id, qv)`, edges
    * from `edges(src, dst)`, entry = `entryK` smallest-entry-hash
    * nodes among those matching `entryCond`, `nSteps` expand rounds.
    * Emits `${p}st$nSteps(query_id, node, idot)` — the final beam.
    */
  private def beamCtes(p: String, qCte: String, edges: String,
      entryCond: String, nSteps: Int): String = {
    val steps = (1 to nSteps).map { r =>
      s"""${p}ex$r AS (SELECT DISTINCT s.query_id, g.dst AS node
         |  FROM ${p}st${r - 1} s JOIN $edges g ON g.src = s.node),
         |${p}sx$r AS (SELECT x.query_id, x.node,
         |    ${idotSql("qq.qv", "c.q")} AS idot
         |  FROM ${p}ex$r x JOIN qz c ON c.vec_id = x.node
         |              JOIN $qCte qq ON qq.query_id = x.query_id),
         |${p}st$r AS MATERIALIZED (SELECT query_id, node, idot FROM (
         |  SELECT query_id, node, idot, row_number() OVER (
         |      PARTITION BY query_id ORDER BY idot DESC, node) AS rn
         |  FROM (SELECT DISTINCT * FROM (
         |    SELECT * FROM ${p}st${r - 1}
         |    UNION ALL SELECT * FROM ${p}sx$r)))
         |  WHERE rn <= $Beam)""".stripMargin
    }.mkString(",\n")
    s"""${p}en AS (SELECT vec_id AS node FROM (
       |  SELECT vec_id, row_number() OVER (ORDER BY
       |      ${hashSql("vec_id", ":entry")}, vec_id) AS rn
       |  FROM qz WHERE $entryCond) WHERE rn <= $EntryK),
       |${p}st0 AS MATERIALIZED (SELECT qq.query_id, ${p}en.node,
       |    ${idotSql("qq.qv", "c.q")} AS idot
       |  FROM $qCte qq CROSS JOIN ${p}en
       |  JOIN qz c ON c.vec_id = ${p}en.node),
       |$steps,
       |${p}srv AS (SELECT query_id, node, idot, row_number() OVER (
       |    PARTITION BY query_id ORDER BY idot DESC, node) AS rn
       |  FROM ${p}st$nSteps WHERE node <> query_id)""".stripMargin
  }

  /** Shared Spark-side build over nodes matching `f` — one definition
    * for all gates.
    */
  private def builtGraph(s: org.apache.spark.sql.SparkSession,
      dir: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column
        = c => c >= Long.MinValue) = {
    val codes = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).getField("q").as("code"))
      .filter(f(col("vec_id")))
    (codes, GraphAnn.nnDescent(codes, "vec_id", "code", K, Rounds,
      Buckets))
  }

  /** Brute-force exact top-k flags for a served frame. */
  private def auditExact(served: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      codes: org.apache.spark.sql.DataFrame) = {
    val qc = queries.select(col("vec_id").as("query_id"),
      col("code").as("__qc"))
    val exact = qc
      .join(codes.select(col("vec_id").as("neighbor_id"),
        col("code").as("__nc")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("__d", dotI(col("__qc"), col("__nc")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__d").desc, col("neighbor_id"))))
      .filter(col("__rn") <= TopK)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("__hit"))
    served.join(exact, Seq("query_id", "neighbor_id"), "left")
      .withColumn("in_exact_top3", coalesce(col("__hit"), lit(false)))
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        col("idot"), col("in_exact_top3"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Brute-force SQL audit over nodes matching `cond`. */
  private def bfSql(cond: String): String =
    s"""bf AS (SELECT query_id, node FROM (
       |  SELECT qq.query_id, z.vec_id AS node, row_number() OVER (
       |      PARTITION BY qq.query_id
       |      ORDER BY ${idotSql("qq.qv", "z.q")} DESC, z.vec_id) AS rn
       |  FROM qq JOIN qz z ON z.vec_id <> qq.query_id
       |  WHERE $cond) WHERE rn <= $TopK)""".stripMargin

  private val servedSelect: String =
    s"""SELECT s.query_id, CAST(s.rn AS BIGINT) AS rn,
       |  s.node AS neighbor_id, s.idot,
       |  (bf.node IS NOT NULL) AS in_exact_top3
       |FROM %SRV% s LEFT JOIN bf
       |  ON bf.query_id = s.query_id AND bf.node = s.node
       |WHERE s.rn <= $TopK
       |ORDER BY s.query_id, s.rn""".stripMargin

  def defs: Map[String, Q] = Map(

    // NN-descent k-NN graph build: k salted hash rings → 3 rounds of
    // co-neighbor refinement → the ranked edge list. Never all-pairs:
    // candidates are co-neighbor pairs of the undirected graph,
    // ≤ n·C(2k,2) per round.
    "q451_nn_descent" -> Q(
      (s, dir) => {
        val (_, graph) = builtGraph(s, dir)
        graph.select(col("src").as("node_id"), col("rn"),
            col("dst").as("neighbor_id"), col("idot"))
          .orderBy(col("node_id"), col("rn"))
      },
      Some(s"""WITH ${graphCtes("TRUE")},
        |fin AS (SELECT e.src, e.dst, ${idotSql("qs.q", "qd.q")} AS idot
        |  FROM e$Rounds e JOIN qz qs ON qs.vec_id = e.src
        |                  JOIN qz qd ON qd.vec_id = e.dst)
        |SELECT src AS node_id, CAST(rn AS BIGINT) AS rn,
        |  dst AS neighbor_id, idot
        |FROM (SELECT src, dst, idot, row_number() OVER (
        |    PARTITION BY src ORDER BY idot DESC, dst) AS rn FROM fin)
        |WHERE rn <= $K
        |ORDER BY node_id, rn""".stripMargin)),

    // Beam-search serve over the built graph, with the exact
    // brute-force recall audit per served row (q443's discipline):
    // fixed deterministic entry points, 4 expand-score-prune steps,
    // self excluded at the end.
    "q452_beam_serve" -> Q(
      (s, dir) => {
        val (codes, graph) = builtGraph(s, dir)
        val queries = codes.filter(col("vec_id") % 100 === 0)
        val served = GraphAnn.beamServe(queries, graph, codes,
          "vec_id", "code", EntryK, Beam, Steps, TopK)
        auditExact(served, queries, codes)
      },
      Some(s"""WITH ${graphCtes("TRUE")},
        |qq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
        |  FROM qz WHERE vec_id % 100 = 0),
        |${beamCtes("b", "qq", s"e$Rounds", "TRUE", Steps)},
        |${bfSql("TRUE")}
        |${servedSelect.replace("%SRV%", "bsrv")}""".stripMargin)),

    // Incremental node insertion (VERDICT round-10 surface; the
    // graph analog of q437's O(delta) IVF maintenance): the graph is
    // built over 90% of the corpus, the remaining 10% attach via
    // beam search over the EXISTING graph, reverse edges re-rank the
    // touched adjacency lists, and standard queries then serve over
    // the UPDATED graph with the brute-force audit against the FULL
    // corpus. The corpus is never re-signed; insert work is
    // O(delta · beam · steps).
    "q457_graph_ann_insert" -> Q(
      (s, dir) => {
        val (base, graph) = builtGraph(s, dir, _ % 10 < 9)
        val all = Tables.embeddings(s, dir)
          .select(col("vec_id"),
            Similarity.quantizeInt8(col("embedding")).getField("q")
              .as("code"))
        val delta = all.filter(col("vec_id") % 10 === 9)
        val updated = GraphAnn.insertNodes(graph.select(col("src"),
            col("dst")), base, delta, "vec_id", "code", K, EntryK,
          Beam, Steps)
        val queries = all.filter(col("vec_id") % 100 === 0)
        val served = GraphAnn.beamServe(queries,
          updated.select(col("src"), col("dst")), all,
          "vec_id", "code", EntryK, Beam, Steps, TopK)
        auditExact(served, queries, all)
      },
      Some(s"""WITH ${graphCtes("vec_id % 10 < 9")},
        |dq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
        |  FROM qz WHERE vec_id % 10 = 9),
        |${beamCtes("a", "dq", s"e$Rounds", "vec_id % 10 < 9", Steps)},
        |att AS (SELECT query_id AS src, node AS dst FROM asrv
        |  WHERE rn <= $K),
        |ucand AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT src, dst FROM e$Rounds
        |  UNION ALL SELECT src, dst FROM att
        |  UNION ALL SELECT dst AS src, src AS dst FROM att)),
        |usc AS (SELECT c.src, c.dst, ${idotSql("qs.q", "qd.q")} AS idot
        |  FROM ucand c JOIN qz qs ON qs.vec_id = c.src
        |               JOIN qz qd ON qd.vec_id = c.dst),
        |f AS MATERIALIZED (SELECT src, dst FROM (
        |  SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY idot DESC, dst) AS rn
        |  FROM usc) WHERE rn <= $K),
        |qq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
        |  FROM qz WHERE vec_id % 100 = 0),
        |${beamCtes("s", "qq", "f", "TRUE", Steps)},
        |${bfSql("TRUE")}
        |${servedSelect.replace("%SRV%", "ssrv")}""".stripMargin)),

    // Node DELETION with local repair (the DiskANN delete/consolidate
    // pattern): 1-in-7 nodes leave; their out-edges drop, survivors
    // that pointed at them SPLICE through the deleted node's own out
    // list, one top-k window re-cuts the touched lists, and serving
    // over the repaired graph is audited against brute force over
    // the LIVE corpus. Repair work is (edges at deleted)·k — never a
    // rebuild.
    "q458_graph_ann_delete" -> Q(
      (s, dir) => {
        val (codes, graph) = builtGraph(s, dir)
        val del = codes.filter(col("vec_id") % 7 === 0)
          .select(col("vec_id"))
        val live = codes.filter(col("vec_id") % 7 =!= 0)
        val repaired = GraphAnn.deleteNodes(
          graph.select(col("src"), col("dst")), codes, del,
          "vec_id", "code", K)
        val queries = live.filter(col("vec_id") % 100 === 0)
        val served = GraphAnn.beamServe(queries,
          repaired.select(col("src"), col("dst")), live,
          "vec_id", "code", EntryK, Beam, Steps, TopK)
        auditExact(served, queries, live)
      },
      Some(s"""WITH ${graphCtes("TRUE")},
        |keptE AS (SELECT src, dst FROM e$Rounds
        |  WHERE src % 7 <> 0 AND dst % 7 <> 0),
        |brokenE AS (SELECT src, dst FROM e$Rounds
        |  WHERE src % 7 <> 0 AND dst % 7 = 0),
        |spl AS (SELECT b.src, g.dst FROM brokenE b
        |  JOIN e$Rounds g ON g.src = b.dst
        |  WHERE g.dst % 7 <> 0 AND b.src <> g.dst),
        |rc AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT * FROM keptE UNION ALL SELECT * FROM spl)),
        |rsc AS (SELECT c.src, c.dst, ${idotSql("qs.q", "qd.q")} AS idot
        |  FROM rc c JOIN qz qs ON qs.vec_id = c.src
        |            JOIN qz qd ON qd.vec_id = c.dst),
        |f AS MATERIALIZED (SELECT src, dst FROM (
        |  SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY idot DESC, dst) AS rn
        |  FROM rsc) WHERE rn <= $K),
        |qq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
        |  FROM qz WHERE vec_id % 100 = 0 AND vec_id % 7 <> 0),
        |${beamCtes("s", "qq", "f", "vec_id % 7 <> 0", Steps)},
        |${bfSql("z.vec_id % 7 <> 0")}
        |${servedSelect.replace("%SRV%", "ssrv")}""".stripMargin))
  )
}
