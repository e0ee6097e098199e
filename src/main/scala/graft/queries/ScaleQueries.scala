package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup}

/** Scale-pattern gates: operators whose whole point is the DISTRIBUTED
  * shape — provably-lossless blocking instead of all-pairs, bucketed
  * numbering instead of a single-partition window. Each oracle states
  * the naive global semantics; the Spark side must reproduce it bit-
  * for-bit through the scalable access path.
  */
object ScaleQueries extends QueryPack {

  override def defs: Map[String, Q] = Map(

    // Bounded edit-distance self-join over variable-length titles
    // (16..32 chars, so the length bands at width 8 genuinely
    // partition and adjacent-band pairs exist). The oracle is the
    // ALL-PAIRS definition — proving the band blocking loses nothing
    // — while the Spark side only ever compares within a 3-bucket
    // neighborhood using the thresholded O(k·n) banded DP.
    "q334_edit_distance_join" -> Q(
      (s, dir) => {
        val titles = Tables.documents(s, dir).select(col("doc_id"),
          expr("substring(text, 1, 16 + doc_id % 17)").as("title"))
        Dedup.editDistanceJoin(titles, "doc_id", "title",
            maxDist = 2, bandWidth = 8)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    substr(coalesce(text, ''), 1, CAST(16 + doc_id % 17 AS INT))
        |      AS title
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(length(a.title) AS BIGINT) AS len_a,
        |  CAST(length(b.title) AS BIGINT) AS len_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.title) - length(b.title)) <= 2
        |  AND levenshtein(a.title, b.title) <= 2
        |ORDER BY id_a, id_b""".stripMargin)),

    // Scalable global row numbering: the oracle is the naive
    // row_number() OVER (ORDER BY doc_id) — which Spark would execute
    // through ONE partition — while the Spark side takes the bucketed
    // count/offset/in-bucket-rank path and must land on identical ids.
    "q335_global_row_number" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        Corpus.globalRowNumber(d, "doc_id", bucketWidth = 32L)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, n_chars,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS row_id
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // PassJoin (Li/Deng/Feng 2011) segment-filtered edit-distance
    // join, against the SAME all-pairs oracle semantics as q334 —
    // but over titles of 24..40 chars, where q334's length bands
    // collapse into one cohort and only the segment equi-join keeps
    // candidates content-proportional. Zero-loss is the gate.
    "q338_passjoin_edit_distance" -> Q(
      (s, dir) => {
        val titles = Tables.documents(s, dir).select(col("doc_id"),
          expr("substring(text, 1, 24 + doc_id % 17)").as("title"))
        Dedup.passJoinEditDistance(titles, "doc_id", "title", maxDist = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    substr(coalesce(text, ''), 1, CAST(24 + doc_id % 17 AS INT))
        |      AS title
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(length(a.title) AS BIGINT) AS len_a,
        |  CAST(length(b.title) AS BIGINT) AS len_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.title) - length(b.title)) <= 2
        |  AND levenshtein(a.title, b.title) <= 2
        |ORDER BY id_a, id_b""".stripMargin)),

    // Heaps'-law vocabulary growth in ONE scan: the oracle states the
    // per-prefix semantics via first-occurrence ranks too, but the
    // Spark side additionally routes ranking through globalRowNumber
    // (no single-partition data window) — step buckets, new-token
    // counts, and the cumulative vocab must all land exactly.
    "q344_vocab_growth" -> Q(
      (s, dir) => {
        Corpus.vocabGrowth(Tables.documents(s, dir), "doc_id", "text",
            steps = 10)
          .orderBy(col("step"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS r
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM d),
        |tok AS (
        |  SELECT r, unnest(CASE WHEN trim(lower(text)) = ''
        |    THEN CAST([] AS VARCHAR[])
        |    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS t
        |  FROM d),
        |f AS (SELECT t, min(r) AS fr FROM tok GROUP BY 1),
        |ts AS (SELECT least(9, (fr * 10) // n.n) AS step,
        |         count(*) AS new_tokens
        |       FROM f, n GROUP BY 1),
        |ds AS (SELECT least(9, (r * 10) // n.n) AS step,
        |         count(*) AS n_docs
        |       FROM d, n GROUP BY 1)
        |SELECT ds.step AS step, n_docs,
        |  coalesce(new_tokens, 0) AS new_tokens,
        |  CAST(sum(coalesce(new_tokens, 0)) OVER (ORDER BY ds.step)
        |    AS BIGINT) AS vocab
        |FROM ds LEFT JOIN ts USING (step) ORDER BY step""".stripMargin)),

    // Adjacent-bigram collocation lift (PMI ratio in exact integer
    // ppm): scan-local positional zip for bigrams, minCount pruning
    // BEFORE the unigram joins. The oracle derives bigrams through a
    // positional self-join instead — same multiset, independently.
    "q345_collocation_lift" -> Q(
      (s, dir) => {
        Corpus.collocationLift(Tables.documents(s, dir), "doc_id",
            "text", minCount = 20L)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(coalesce(text, ''))) = ''
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(trim(lower(coalesce(text, ''))),
        |        '\s+') END AS ts
        |  FROM documents),
        |tok AS (SELECT doc_id, generate_subscripts(ts, 1) AS p,
        |          unnest(ts) AS t FROM d),
        |uni AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bg AS (SELECT a.t AS a, b.t AS b
        |       FROM tok a JOIN tok b
        |         ON a.doc_id = b.doc_id AND b.p = a.p + 1),
        |bi AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2
        |       HAVING count(*) >= 20)
        |SELECT bi.a AS a, bi.b AS b, cab, ua.c AS ca, ub.c AS cb,
        |  (cab * n.n * 1000000) // (ua.c * ub.c) AS lift_ppm
        |FROM bi CROSS JOIN n
        |  JOIN uni ua ON bi.a = ua.t
        |  JOIN uni ub ON bi.b = ub.t
        |ORDER BY a, b""".stripMargin))
  )
}
