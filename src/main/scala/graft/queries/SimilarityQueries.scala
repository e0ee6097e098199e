package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** q31–q32: similarity search over the embeddings table — exact
  * brute-force cosine top-k and the LSH-bucketed ANN variant. Both are
  * oracle-gated: scores are strict left-to-right double reductions and
  * the hyperplanes are interpolated verbatim into the DuckDB SQL, so
  * even the APPROXIMATE path is bit-reproducible.
  */
object SimilarityQueries extends QueryPack {

  /** DuckDB rendition of [[Similarity.dot]]: [0.0] seed + left fold,
    * exactly Spark's `aggregate(zip_with(...), 0.0, +)`.
    */
  private def dd(a: String, b: String) =
    s"list_reduce([0.0] || list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (acc, x) -> acc + x)"

  private def cosSql(a: String, b: String) =
    s"${dd(a, b)} / (sqrt(${dd(a, a)}) * sqrt(${dd(b, b)}))"

  private val Planes = Similarity.hyperplanes(planes = 6, dim = 64)

  def defs: Map[String, Q] = Map(
    // Exact baseline: every ~100th vector queries the whole corpus.
    "q31_cosine_topk" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(
            e.filter(col("vec_id") % 100 === 0), e, "vec_id", "embedding", 5)
          .orderBy(col("query_id"), col("rn"))
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
        |s AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         ${cosSql("qv", "v")} AS cos
        |  FROM q JOIN e ON q.query_id <> e.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, rn, neighbor_id, cos AS cosine
        |FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin)),

    // Scale path: 6-plane LSH buckets (64-way fan-out), single-probe.
    "q32_ann_lsh" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.annTopK(
            e.filter(col("vec_id") % 100 === 0), e, "vec_id", "embedding",
            Planes, 3)
          .orderBy(col("query_id"), col("rn"))
      },
      {
        val planeLits = Planes.map(p => p.mkString("([", ", ", "]::DOUBLE[])"))
        val bucketExpr = planeLits.zipWithIndex.map { case (pl, j) =>
          s"(CASE WHEN ${dd("v", pl)} > 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
        Some(s"""WITH e AS (
          |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |b AS (
          |  SELECT vec_id, v, $bucketExpr AS bucket FROM e),
          |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id % 100 = 0),
          |s AS (
          |  SELECT q.query_id, b.vec_id AS neighbor_id,
          |         ${cosSql("qv", "v")} AS cos
          |  FROM q JOIN b USING (bucket) WHERE q.query_id <> b.vec_id),
          |r AS (
          |  SELECT query_id, neighbor_id, cos,
          |         row_number() OVER (PARTITION BY query_id
          |           ORDER BY cos DESC, neighbor_id) AS rn
          |  FROM s)
          |SELECT query_id, rn, neighbor_id, cos AS cosine
          |FROM r WHERE rn <= 3
          |ORDER BY query_id, rn""".stripMargin)
      }),

    // Embedding-cosine near-dup: pairs within the same LSH bucket
    // whose cosine clears the dedup threshold — the vector analog of
    // MinHash near-dup (candidate generation is the bucket equi-join,
    // verification is exact cosine; at 100 TB the bucket join bounds
    // the pair count).
    "q39_embed_near_dup" -> Q(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val b = e.select(col("vec_id"), col("embedding"),
          Similarity.hyperplaneBucket(col("embedding"), Planes).as("bucket"))
        val a = b.select(col("bucket"), col("vec_id").as("id_a"),
          col("embedding").as("va"))
        val c = b.select(col("bucket"), col("vec_id").as("id_b"),
          col("embedding").as("vb"))
        a.join(c, Seq("bucket"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("cos", Similarity.cosineNative(col("va"), col("vb")))
          .filter(col("cos") >= 0.4)
          .select(col("id_a"), col("id_b"), col("cos").as("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      {
        val planeLits = Planes.map(p => p.mkString("([", ", ", "]::DOUBLE[])"))
        val bucketExpr = planeLits.zipWithIndex.map { case (pl, j) =>
          s"(CASE WHEN ${dd("v", pl)} > 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
        Some(s"""WITH e AS (
          |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
          |p AS (
          |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
          |         ${cosSql("a.v", "b2.v")} AS cos
          |  FROM b a JOIN b b2 USING (bucket) WHERE a.vec_id < b2.vec_id)
          |SELECT id_a, id_b, cos AS cosine
          |FROM p WHERE cos >= 0.4
          |ORDER BY id_a, id_b""".stripMargin)
      })
  )
}
