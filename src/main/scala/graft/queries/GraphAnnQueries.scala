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
  private val InsSteps = 3 // ingest attach-beam steps (latency knob)
  private val UpperSteps = 2 // layered serve: steps over the sparse layer
  private val LowerSteps = 3 // layered serve: steps over the full graph
  private val UpperBuckets = 4 // upper layer ring buckets (~n/4 nodes)

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
      entryCond: String, nSteps: Int): String =
    beamCtesL(p, qCte, Seq.fill(nSteps)(edges), entryCond)

  /** [[beamCtes]] with a PER-STEP edge table — the layered-descent
    * (q469) replay: the first steps expand over the sparse upper
    * layer, the rest over the full graph, one beam state throughout.
    */
  private def beamCtesL(p: String, qCte: String,
      stepEdges: Seq[String], entryCond: String): String = {
    val nSteps = stepEdges.size
    val steps = (1 to nSteps).map { r =>
      val edges = stepEdges(r - 1)
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

  /** The full int8-quantized corpus, lazily PERSISTED (optimization
    * r15, guide §5): every gate's build rounds, serve steps and audits
    * re-scan the codes frame many times; one shared cache (deduped by
    * canonical plan across gates in a pack JVM, freed by the
    * ContextCleaner) replaces the repeated parquet-scan+quantize.
    */
  private def allCodes(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        Similarity.quantizeInt8(col("embedding")).getField("q").as("code"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Shared Spark-side build over nodes matching `f` — one definition
    * for all gates.
    */
  private def builtGraph(s: org.apache.spark.sql.SparkSession,
      dir: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column
        = c => c >= Long.MinValue) = {
    val codes = allCodes(s, dir).filter(f(col("vec_id")))
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

  /** [[GraphAnn.ringInitEdges]] replay over nodes matching `cond`
    * with its own CTE prefix — the upper-layer build of the layered
    * serve (q469), where the layer graph is k rings over a
    * hash-sampled subset, never NN-descent-refined.
    */
  private def ringSql(pfx: String, cond: String, buckets: Int): String = {
    val rings = (1 to K).map { j =>
      s"""${pfx}rj$j AS (SELECT vec_id, h, h % $buckets AS b FROM (
         |  SELECT vec_id, ${hashSql("vec_id", s":ring$j")} AS h
         |  FROM qz WHERE $cond)),
         |${pfx}rk$j AS MATERIALIZED (SELECT vec_id, b,
         |    row_number() OVER (PARTITION BY b ORDER BY h, vec_id) AS r,
         |    count(*) OVER (PARTITION BY b) AS c
         |  FROM ${pfx}rj$j),
         |${pfx}ed$j AS (SELECT a.vec_id AS src, bb.vec_id AS dst
         |  FROM ${pfx}rk$j a JOIN ${pfx}rk$j bb
         |    ON a.b = bb.b AND bb.r = a.r % a.c + 1)""".stripMargin
    }.mkString(",\n")
    val u = (1 to K).map(j => s"SELECT * FROM ${pfx}ed$j")
      .mkString(" UNION ALL ")
    s"""$rings,
       |${pfx}E AS MATERIALIZED (SELECT DISTINCT src, dst FROM ($u)
       |  WHERE src <> dst)""".stripMargin
  }

  /** One incremental-insert replay (the q457 oracle's middle stage,
    * factored for the multi-batch q468): delta queries matching
    * `deltaCond` attach by an `InsSteps`-step beam over `edges` with
    * entry from `entryCond` nodes, reverse edges join the candidate
    * set, one top-K window cuts the updated index `${pfx}f`.
    */
  private def insertSql(pfx: String, edges: String, deltaCond: String,
      entryCond: String): String =
    s"""${pfx}dq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
       |  FROM qz WHERE $deltaCond),
       |${beamCtes(s"${pfx}b", s"${pfx}dq", edges, entryCond, InsSteps)},
       |${pfx}att AS (SELECT query_id AS src, node AS dst
       |  FROM ${pfx}bsrv WHERE rn <= $K),
       |${pfx}uc AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM $edges
       |  UNION ALL SELECT src, dst FROM ${pfx}att
       |  UNION ALL SELECT dst AS src, src AS dst FROM ${pfx}att)),
       |${pfx}us AS (SELECT c.src, c.dst, ${idotSql("qs.q", "qd.q")} AS idot
       |  FROM ${pfx}uc c JOIN qz qs ON qs.vec_id = c.src
       |                  JOIN qz qd ON qd.vec_id = c.dst),
       |${pfx}f AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY idot DESC, dst) AS rn
       |  FROM ${pfx}us) WHERE rn <= $K)""".stripMargin

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
        val all = allCodes(s, dir)
        val delta = all.filter(col("vec_id") % 10 === 9)
        // pass the RANKED build (rn+idot): untouched adjacency lists
        // then ride through the insert without a re-score (r16)
        val updated = GraphAnn.insertNodes(graph, base, delta,
          "vec_id", "code", K, EntryK, Beam, Steps)
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
        // ranked input (rn+idot): survivors with no broken edge keep
        // their lists without a re-score (r16)
        val repaired = GraphAnn.deleteNodes(graph, codes, del,
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
        |${servedSelect.replace("%SRV%", "ssrv")}""".stripMargin)),

    // STREAMING graph-ANN ingest (VERDICT r10 item 4): the serving
    // graph stays fresh from a stream — two staged delta files arrive
    // as separate micro-batches (maxFilesPerTrigger=1) and each batch
    // applies GraphAnn.insertNodes against the index AS OF ITS
    // ARRIVAL (batch 1's beam legitimately routes through batch 0's
    // nodes — sequential semantics, which is what a live index does;
    // a single-shot insert of the union is a DIFFERENT answer). The
    // oracle replays both sequential inserts and the final serve.
    // State is the (n·K)-bounded edge list + codes, localCheckpointed
    // per batch — the q437/q444 streaming-maintenance pattern on the
    // graph index family.
    "q468_stream_graph_ingest" -> Q(
      (s, dir) => {
        import graft.streaming.Streams
        val (base, graph0) = builtGraph(s, dir, _ % 10 < 8)
        val all = allCodes(s, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft_gis")
        val streamDir = tmp.resolve("in")
        java.nio.file.Files.createDirectories(streamDir)
        Seq(8L, 9L).zipWithIndex.foreach { case (m, i) =>
          val stage = tmp.resolve(s"stage$i")
          all.filter(col("vec_id") % 10 === m).coalesce(1)
            .write.parquet(stage.toString)
          val part = stage.toFile.listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          java.nio.file.Files.move(part.toPath,
            streamDir.resolve(s"b$i.parquet"))
          ()
        }
        // the loop state keeps the RANKED edge list (src, rn, dst,
        // idot): each batch's insertNodes then re-scores only the
        // adjacency lists that batch touches (r16)
        var graph = graph0.localCheckpoint(true)
        var codes = base.localCheckpoint(true)
        val ckpt = Streams.scratchCheckpointDir("graft-gis-ck")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        try {
          Streams.transformEachBatch(
            s.readStream.schema(all.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(streamDir.toString),
            batch => batch,
            batch => {
              val delta = batch.localCheckpoint(true)
              graph = GraphAnn.insertNodes(graph, codes, delta,
                  "vec_id", "code", K, EntryK, Beam, InsSteps)
                .localCheckpoint(true)
              codes = codes.unionByName(delta).localCheckpoint(true)
            },
            ckpt.toString,
            Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
            .awaitTermination()
        } finally { rm(ckpt.toFile); rm(tmp.toFile) }
        val queries = all.filter(col("vec_id") % 100 === 0)
        val served = GraphAnn.beamServe(queries, graph, all,
          "vec_id", "code", EntryK, Beam, Steps, TopK)
        auditExact(served, queries, all)
      },
      Some(s"""WITH ${graphCtes("vec_id % 10 < 8")},
        |${insertSql("i0", s"e$Rounds", "vec_id % 10 = 8",
          "vec_id % 10 < 8")},
        |${insertSql("i1", "i0f", "vec_id % 10 = 9",
          "vec_id % 10 <= 8")},
        |qq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
        |  FROM qz WHERE vec_id % 100 = 0),
        |${beamCtes("s", "qq", "i1f", "TRUE", Steps)},
        |${bfSql("TRUE")}
        |${servedSelect.replace("%SRV%", "ssrv")}""".stripMargin)),

    // HNSW-style LAYERED entry (VERDICT r10 item 6): a sparse upper
    // layer — k salted hash rings over a 1-in-4 hash sample of the
    // corpus, never refined — routes the beam in 2 cheap steps, then
    // only 3 full-graph steps finish the walk (vs q452's 5), with
    // the same brute-force audit. Layer membership is a salted-hash
    // draw (the deterministic analog of HNSW's level assignment), so
    // the whole descent replays in SQL. At 100 TB the upper layer's
    // edge table is fanout^-1 of the corpus — the expansion joins it
    // touches are a sliver of the bottom layer's.
    "q469_layered_serve" -> Q(
      (s, dir) => {
        val (codes, graph) = builtGraph(s, dir)
        val upperNodes = codes.filter(
          GraphAnn.saltedHash60(col("vec_id"), ":layer")
            % UpperBuckets === 0)
        val upper = GraphAnn.ringInitEdges(upperNodes, "vec_id", K,
          UpperBuckets)
        val queries = codes.filter(col("vec_id") % 100 === 0)
        val served = GraphAnn.beamServeLayered(queries,
          Seq((upper, UpperSteps),
            (graph.select(col("src"), col("dst")), LowerSteps)),
          upperNodes, codes, "vec_id", "code", EntryK, Beam, TopK)
        auditExact(served, queries, codes)
      },
      {
        val layerCond =
          s"${hashSql("vec_id", ":layer")} % $UpperBuckets = 0"
        Some(s"""WITH ${graphCtes("TRUE")},
          |${ringSql("u", layerCond, UpperBuckets)},
          |qq AS MATERIALIZED (SELECT vec_id AS query_id, q AS qv
          |  FROM qz WHERE vec_id % 100 = 0),
          |${beamCtesL("l", "qq",
            Seq.fill(UpperSteps)("uE") ++
              Seq.fill(LowerSteps)(s"e$Rounds"), layerCond)},
          |${bfSql("TRUE")}
          |${servedSelect.replace("%SRV%", "lsrv")}""".stripMargin)
      })
  )
}
