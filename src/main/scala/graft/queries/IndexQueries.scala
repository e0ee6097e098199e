package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, LanguageModel, Search, Sketch}

/** q100–q105: corpus indexing, language-model scoring, and
  * membership/cardinality sketches — retrieval and statistics
  * operators a training-data pipeline layers over the cleaned corpus.
  *
  * Everything is oracle-gated with integer-exact arithmetic: LM
  * conditional probabilities ride as integer parts-per-million, the
  * Bloom bitmap packs 63 bits/word so no engine touches the BIGINT
  * sign bit, and HLL ranks derive from binary-string length — float
  * paths (BM25, the HLL harmonic-mean readout) are spec-gated on
  * planted fixtures instead.
  */
object IndexQueries extends QueryPack {

  /** DuckDB rendition of TextAnalysis.tokens (same guard as
    * LlmQueries: empty text ⇒ empty list, not ['']).
    */
  private val toksCte =
    """t AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents)""".stripMargin

  /** token-frequency CTE (token, doc_id, tf) shared by the index and
    * search oracles.
    */
  private val tfCte =
    s"""$toksCte,
      |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
      |tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)""".stripMargin

  def defs: Map[String, Q] = Map(

    // Bigram LM surprise: the corpus model (c12, c1) is trained and
    // every doc scored in one plan — n_bigrams, Σ ppm(p(w2|w1)), and
    // novel-bigram occurrences. Integer division keeps both engines
    // bit-identical (positive operands: Spark `div` truncation ==
    // DuckDB `//` floor).
    "q100_bigram_surprise" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val model = LanguageModel.bigramCounts(docs, "text")
        val scored = LanguageModel.surprise(docs, model, "doc_id", "text")
        docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("surprise_ppm"), lit(0L)).as("surprise_ppm"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksCte,
        |bg AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |c AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |h AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c GROUP BY 1),
        |d AS (SELECT doc_id, w1, w2, count(*) AS cd FROM bg GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT d.doc_id,
        |    CAST(sum(d.cd) AS BIGINT) AS n_bigrams,
        |    CAST(sum(d.cd * ((1000000 * c.c12) // h.c1)) AS BIGINT) AS surprise_ppm,
        |    CAST(sum(CASE WHEN d.cd = c.c12 THEN d.cd ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM d JOIN c ON d.w1 = c.w1 AND d.w2 = c.w2
        |         JOIN h ON d.w1 = h.w1
        |  GROUP BY 1)
        |SELECT t.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  coalesce(sc.surprise_ppm, 0) AS surprise_ppm,
        |  coalesce(sc.n_novel, 0) AS n_novel
        |FROM t LEFT JOIN sc ON t.doc_id = sc.doc_id
        |ORDER BY t.doc_id""".stripMargin)),

    // Inverted index rollup: per token, df, total tf, and the head of
    // the tf-desc/doc-asc-sorted postings (the deterministic shard
    // order); the oracle re-derives the top posting with a window.
    "q101_inverted_index" -> Q(
      (s, dir) => {
        val tf = Search.termFrequencies(
          Tables.documents(s, dir), "doc_id", "text")
        Search.invertedIndex(tf, 5)
          .select(col("token"), col("df"), col("total_tf"),
            element_at(col("top_postings"), 1).getField("doc_id")
              .as("top_doc"),
            element_at(col("top_postings"), 1).getField("tf").as("top_tf"))
          .orderBy(col("token"))
      },
      Some(s"""WITH $tfCte,
        |idx AS (
        |  SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        |  FROM tf GROUP BY 1),
        |top1 AS (
        |  SELECT token, doc_id AS top_doc, tf AS top_tf FROM (
        |    SELECT token, doc_id, tf,
        |      row_number() OVER (PARTITION BY token
        |                         ORDER BY tf DESC, doc_id ASC) AS rn
        |    FROM tf) WHERE rn = 1)
        |SELECT idx.token, idx.df, idx.total_tf, top1.top_doc, top1.top_tf
        |FROM idx JOIN top1 ON idx.token = top1.token
        |ORDER BY idx.token""".stripMargin)),

    // Conjunctive keyword search: docs containing ALL query terms,
    // integer tf-sum score, score-desc/doc-asc top-20 — fully
    // deterministic ranking under the hash gate.
    "q102_keyword_search" -> Q(
      (s, dir) => Search.searchAll(
        Search.termFrequencies(Tables.documents(s, dir), "doc_id", "text"),
        Seq("spark", "join"), 20),
      Some(s"""WITH $tfCte,
        |m AS (
        |  SELECT doc_id, count(*) AS nm, CAST(sum(tf) AS BIGINT) AS score
        |  FROM tf WHERE token IN ('spark', 'join') GROUP BY 1)
        |SELECT doc_id, score FROM m WHERE nm = 2
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // Cross-doc repeated-segment removal: 2-token segments seen in
    // more than 10 distinct docs are boilerplate; docs reassemble
    // from surviving segments in order. The oracle rebuilds
    // clean_text with an ordered string_agg.
    "q103_segment_dedup" -> Q(
      (s, dir) => Dedup.dropRepeatedSegments(
          Tables.documents(s, dir), "doc_id", "text",
          segTokens = 2, maxDocs = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
        |sg AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(toks[(i * 2 + 1):((i + 1) * 2)], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(0,
        |            CAST(ceil(len(toks) / 2.0) AS INT) - 1)) AS i
        |        FROM t WHERE len(toks) > 0)),
        |c AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM sg GROUP BY 1)
        |SELECT sg.doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN c.n_docs > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN c.n_docs <= 10 THEN sg.seg END,
        |                      ' ' ORDER BY sg.pos), '') AS clean_text
        |FROM sg JOIN c ON sg.seg = c.seg
        |GROUP BY sg.doc_id
        |ORDER BY sg.doc_id""".stripMargin)),

    // Bloom membership: the filter is built over the even customer
    // keys and probed with ALL keys — true members must read maybe
    // (no false negatives), and the odd keys' false positives are a
    // deterministic function of the md5 hash family that the oracle
    // reproduces bit-for-bit (63-bit words, both engines).
    "q104_bloom_filter" -> Q(
      (s, dir) => {
        val nBits = 63 * 256
        val keys = Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(concat(lit("c"), col("c_custkey")).as("k"))
        val bloom = Sketch.bloomBuild(keys, col("k"), nBits, 3)
        val probes = Tables.customer(s, dir)
          .select(col("c_custkey"), concat(lit("c"), col("c_custkey")).as("k"))
        Sketch.bloomMightContain(bloom, probes, col("k"), nBits, 3)
          .orderBy(col("c_custkey"))
      },
      Some("""WITH hs AS (SELECT unnest([0, 1, 2]) AS i),
        |pos AS (
        |  SELECT CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
        |  FROM customer CROSS JOIN hs WHERE c_custkey % 2 = 0),
        |bm AS (
        |  SELECT p // 63 AS word_idx,
        |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
        |  FROM pos GROUP BY 1),
        |pp AS (
        |  SELECT c_custkey, 'c' || c_custkey AS k,
        |         CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
        |  FROM customer CROSS JOIN hs)
        |SELECT c_custkey, k,
        |  bool_and((coalesce(bm.bits, 0) & (1::BIGINT << CAST(p % 63 AS INT)))
        |           = (1::BIGINT << CAST(p % 63 AS INT))) AS might_contain
        |FROM pp LEFT JOIN bm ON pp.p // 63 = bm.word_idx
        |GROUP BY 1, 2
        |ORDER BY c_custkey""".stripMargin)),

    // HLL register table over the order keys: idx = low 6 hash bits,
    // rank = leading-zero count of the remaining 54 bits + 1, computed
    // via binary-string LENGTH in both engines (integer-exact — no
    // float log2). The harmonic-mean estimate over these registers is
    // spec-gated (SketchSpec) since it's a driver-side double readout.
    "q105_hll_registers" -> Q(
      (s, dir) => Sketch.hllRegisters(
          Tables.orders(s, dir)
            .select(concat(lit("o"), col("o_orderkey")).as("k")),
          col("k"), 64)
        .orderBy(col("idx")),
      Some("""WITH k AS (
        |  SELECT CAST(('0x' || substr(md5('o' || o_orderkey), 1, 15)) AS BIGINT) AS h
        |  FROM orders),
        |rk AS (
        |  SELECT h % 64 AS idx,
        |    CASE WHEN (h >> 6) = 0 THEN 55
        |         ELSE 55 - length(bin(h >> 6)) END AS rank
        |  FROM k)
        |SELECT idx, CAST(max(rank) AS INT) AS max_rank
        |FROM rk GROUP BY idx
        |ORDER BY idx""".stripMargin))
  )
}
