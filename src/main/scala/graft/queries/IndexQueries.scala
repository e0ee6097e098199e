package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Urls
import graft.operators.{Bpe, Dedup, LanguageModel, Search, Similarity, Sketch}

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

  /** One BPE training round as CTE stages (pair counts → total-order
    * argmax → merge replace) — shared by the q107 (train) and q110
    * (encode) oracles so both replay the identical iteration.
    * The merge is a LEFT JOIN with a null-guard no-op: when a round
    * has no remaining adjacent pair (all-single-symbol vocabulary),
    * b$n is empty and the round must keep the vocabulary unchanged —
    * matching Bpe.train's early-stop semantics (a CROSS JOIN would
    * drop every word).
    */
  private def bpeStage(n: Int): String = {
    val prev = s"w${n - 1}"
    s"""p$n AS (
      |  SELECT syms[i] AS l, syms[i + 1] AS r,
      |         CAST(sum(cnt) AS BIGINT) AS pc
      |  FROM (SELECT cnt, syms,
      |          unnest(generate_series(1, len(syms) - 1)) AS i
      |        FROM (SELECT cnt,
      |                string_split_regex(trim(sym), '\\s+') AS syms
      |              FROM $prev)
      |        WHERE len(syms) >= 2)
      |  GROUP BY 1, 2),
      |b$n AS (SELECT l, r FROM p$n ORDER BY pc DESC, l, r LIMIT 1),
      |w$n AS (
      |  SELECT word, cnt,
      |    CASE WHEN l IS NULL THEN sym
      |         ELSE replace(sym, ' ' || l || '  ' || r || ' ',
      |                      ' ' || l || r || ' ') END AS sym
      |  FROM $prev LEFT JOIN b$n ON TRUE)""".stripMargin
  }

  /** lower-cased token vocabulary + initial symbolization (w0) — the
    * head of both BPE oracles.
    */
  private val bpeHeadCte =
    """tok AS (
      |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
      |                ELSE string_split_regex(trim(lower(text)), '\s+') END) AS word
      |  FROM documents),
      |w0 AS (
      |  SELECT word, count(*) AS cnt,
      |    ' ' || regexp_replace(word, '(.)', '\1  ', 'g') AS sym
      |  FROM tok GROUP BY word)""".stripMargin

  def defs: Map[String, Q] = Map(

    // Bigram LM surprise: the corpus model (c12, c1) is trained and
    // every doc scored in one plan — n_bigrams, Σ ppm(p(w2|w1)), and
    // novel-bigram occurrences. Integer division keeps both engines
    // bit-identical (positive operands: Spark `div` truncation ==
    // DuckDB `//` floor). Bigram keys ride the native WordShingles
    // expression, which case-folds — the oracle tokenizes lower(text).
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
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg,
        |         toks[i] AS w1
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM t WHERE len(toks) >= 2)),
        |c AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
        |h AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        |d AS (SELECT doc_id, bg, w1, count(*) AS cd FROM bg GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT d.doc_id,
        |    CAST(sum(d.cd) AS BIGINT) AS n_bigrams,
        |    CAST(sum(d.cd * ((1000000 * c.c12) // h.c1)) AS BIGINT) AS surprise_ppm,
        |    CAST(sum(CASE WHEN d.cd = c.c12 THEN d.cd ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM d JOIN c ON d.bg = c.bg
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
        |c AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM sg GROUP BY 1),
        |agg AS (
        |  SELECT sg.doc_id, count(*) AS n_segments,
        |    CAST(sum(CASE WHEN c.n_docs > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |    coalesce(string_agg(CASE WHEN c.n_docs <= 10 THEN sg.seg END,
        |                        ' ' ORDER BY sg.pos), '') AS clean_text
        |  FROM sg JOIN c ON sg.seg = c.seg
        |  GROUP BY sg.doc_id)
        |SELECT d.doc_id, coalesce(agg.n_segments, 0) AS n_segments,
        |  coalesce(agg.n_dropped, 0) AS n_dropped,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin)),

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

    // Two-pass heavy hitters at a collision-rich width (d=2, w=8 over
    // a ~31-token vocab): CMS candidates ≥900 include inflated
    // sub-threshold tokens, and the exact verification pass marks
    // them confirmed=false — the oracle reproduces the counter table
    // from the same fixed hash constants (q93's discipline) plus the
    // exact counts.
    "q106_heavy_hitters" -> Q(
      (s, dir) => Sketch.heavyHitters(
          Tables.documents(s, dir)
            .select(explode(graft.operators.TextAnalysis.tokens(
              lower(col("text")))).as("t")),
          col("t"), d = 2, w = 8, threshold = 900L)
        .orderBy(col("term")),
      {
        val P = Dedup.P
        def rowsSql(src: String, extra: String) = Dedup.perms(2).zipWithIndex
          .map { case ((a, b), i) =>
            s"SELECT $extra$i AS i, ((h * $a + $b) % $P) % 8 AS bucket FROM $src"
          }.mkString("\n|    UNION ALL ")
        Some(s"""WITH tok AS (
          |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
          |                ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS t
          |  FROM documents),
          |h AS (SELECT t, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % $P AS h FROM tok),
          |ctr AS (
          |  SELECT i, bucket, count(*) AS cnt FROM (
          |    ${rowsSql("h", "")})
          |  GROUP BY i, bucket),
          |dh AS (SELECT t, h FROM (SELECT DISTINCT t FROM tok),
          |       LATERAL (SELECT CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % $P AS h)),
          |pb AS (
          |    ${rowsSql("dh", "t, ")}),
          |est AS (
          |  SELECT pb.t AS term, min(coalesce(ctr.cnt, 0)) AS cms_est
          |  FROM pb LEFT JOIN ctr ON pb.i = ctr.i AND pb.bucket = ctr.bucket
          |  GROUP BY pb.t),
          |ex AS (SELECT t AS term, count(*) AS exact_cnt FROM tok GROUP BY 1)
          |SELECT est.term, est.cms_est, ex.exact_cnt,
          |  ex.exact_cnt >= 900 AS confirmed
          |FROM est JOIN ex ON est.term = ex.term
          |WHERE est.cms_est >= 900
          |ORDER BY est.term""".stripMargin)
      }),

    // BPE merge training, 3 rounds over the corpus word vocabulary:
    // the oracle REPLAYS the full iteration — per-round pair counts,
    // the total-order argmax (count desc, left/right lexicographic),
    // and the double-space-delimited merge replace — as three chained
    // CTE stages, then compares the final symbolization of every
    // word. The same iterative-trainer gating as q84's k-means.
    "q107_bpe_train" -> Q(
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(graft.operators.TextAnalysis.tokens(
            lower(col("text")))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val (words, _) = Bpe.train(vocab, "word", "cnt", rounds = 3)
        words.select(col("word"), col("cnt"), col("sym"))
          .orderBy(col("word"))
      },
      Some(s"""WITH $bpeHeadCte,
        |${bpeStage(1)},
        |${bpeStage(2)},
        |${bpeStage(3)}
        |SELECT word, cnt, sym FROM w3
        |ORDER BY word""".stripMargin)),

    // URL canonicalization over generator-synthesized messy URLs
    // (upper-case scheme/host, www., default port, trailing slash,
    // utm_* tracking params, fragment). The oracle restates the
    // EXPECTED canonical form in closed form from the generator
    // arithmetic — it never runs the normalizer, so regex bugs can't
    // self-confirm.
    "q108_url_normalize" -> Q(
      (s, dir) => {
        val ck = col("c_custkey")
        val raw = concat(
          lit("HTTP://WWW.Site"), ck % 7, lit(".COM"),
          when(ck % 3 === 0, ":80").otherwise(""),
          lit("/Path/"), ck % 5,
          when(ck % 2 === 0, "/").otherwise(""),
          when(ck % 4 === 0, concat(lit("?utm_source=mail&id="), ck))
            .when(ck % 4 === 1, concat(lit("?id="), ck))
            .otherwise(lit("")),
          when(ck % 6 === 0, "#frag").otherwise(""))
        Tables.customer(s, dir)
          .select(ck, raw.as("url"))
          .select(ck, col("url"),
            Urls.normalize(col("url")).as("url_norm"),
            Urls.host(col("url")).as("host"))
          .orderBy(ck)
      },
      Some("""SELECT c_custkey,
        |  'HTTP://WWW.Site' || (c_custkey % 7) || '.COM' ||
        |    CASE WHEN c_custkey % 3 = 0 THEN ':80' ELSE '' END ||
        |    '/Path/' || (c_custkey % 5) ||
        |    CASE WHEN c_custkey % 2 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN c_custkey % 4 = 0 THEN '?utm_source=mail&id=' || c_custkey
        |         WHEN c_custkey % 4 = 1 THEN '?id=' || c_custkey
        |         ELSE '' END ||
        |    CASE WHEN c_custkey % 6 = 0 THEN '#frag' ELSE '' END AS url,
        |  'http://site' || (c_custkey % 7) || '.com/Path/' || (c_custkey % 5) ||
        |    CASE WHEN c_custkey % 4 IN (0, 1) THEN '?id=' || c_custkey
        |         ELSE '' END AS url_norm,
        |  'site' || (c_custkey % 7) || '.com' AS host
        |FROM customer
        |ORDER BY c_custkey""".stripMargin)),

    // Symmetric int8 quantization of every embedding, exploded to
    // (vec_id, pos, q, scale) so each quantized component is gated.
    // Both engines divide the SAME doubles (floats widen exactly) and
    // truncate toward zero — the oracle uses trunc(), never a
    // rounding CAST (DuckDB casts round half-even).
    "q109_quantize_int8" -> Q(
      (s, dir) => {
        val q = Similarity.quantizeInt8(col("embedding"))
        Tables.embeddings(s, dir)
          .select(col("vec_id"), q.getField("scale").as("scale"),
            posexplode(q.getField("q")).as(Seq("pos", "q")))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            col("q"), col("scale"))
          .orderBy(col("vec_id"), col("pos"))
      },
      Some("""WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |x AS (
        |  SELECT vec_id, embedding, maxabs,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM e)
        |SELECT vec_id, i - 1 AS pos,
        |  CASE WHEN maxabs = 0 THEN 0
        |       ELSE CAST(trunc(CAST(embedding[i] AS DOUBLE) / (maxabs / 127.0)) AS INT)
        |  END AS q,
        |  maxabs / 127.0 AS scale
        |FROM x
        |ORDER BY vec_id, pos""".stripMargin)),

    // BPE ENCODE (tokenizer inference): documents are encoded against
    // the 3-round trained vocabulary via a broadcast word→pieces
    // lookup — never by re-running merges per occurrence. The oracle
    // replays the identical training stages, then joins each doc's
    // tokens to the final symbolization and sums subword counts.
    "q110_bpe_encode" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = docs
          .select(explode(graft.operators.TextAnalysis.tokens(
            lower(col("text")))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val (words, _) = Bpe.train(vocab, "word", "cnt", rounds = 3)
        val encoded = Bpe.encodeByVocab(docs, "doc_id", "text", words)
        docs.select(col("doc_id")).join(encoded, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $bpeHeadCte,
        |${bpeStage(1)},
        |${bpeStage(2)},
        |${bpeStage(3)},
        |t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
        |  FROM documents),
        |dt AS (SELECT doc_id, unnest(toks) AS word FROM t),
        |e AS (
        |  SELECT dt.doc_id, count(*) AS n_tokens,
        |    CAST(sum(coalesce(
        |      len(string_split_regex(trim(w3.sym), '\\s+')),
        |      length(dt.word))) AS BIGINT) AS n_subwords
        |  FROM dt LEFT JOIN w3 ON dt.word = w3.word
        |  GROUP BY 1)
        |SELECT t.doc_id, coalesce(e.n_tokens, 0) AS n_tokens,
        |  coalesce(e.n_subwords, 0) AS n_subwords
        |FROM t LEFT JOIN e ON t.doc_id = e.doc_id
        |ORDER BY t.doc_id""".stripMargin)),

    // Per-group HLL registers: one register table per document source
    // — the "approx distinct docs per dimension" sketch, still
    // integer-exact and oracle-reproducible.
    "q111_hll_by_source" -> Q(
      (s, dir) => Sketch.hllRegistersBy(
          Tables.documents(s, dir),
          col("source"), concat(lit("d"), col("doc_id")), 64)
        .orderBy(col("grp"), col("idx")),
      Some("""WITH k AS (
        |  SELECT source AS grp,
        |    CAST(('0x' || substr(md5('d' || doc_id), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |rk AS (
        |  SELECT grp, h % 64 AS idx,
        |    CASE WHEN (h >> 6) = 0 THEN 55
        |         ELSE 55 - length(bin(h >> 6)) END AS rank
        |  FROM k)
        |SELECT grp, idx, CAST(max(rank) AS INT) AS max_rank
        |FROM rk GROUP BY grp, idx
        |ORDER BY grp, idx""".stripMargin)),

    // Eval-set extraction: top-5 docs per source by quality score
    // (desc, doc_id tiebreak) — the curated-holdout step of a corpus
    // pipeline. Quality doubles are deterministic products of ratio
    // terms (the q41 discipline: raw doubles, never rounded), so the
    // cross-engine ordering and values hash-match.
    "q112_eval_extract" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            graft.operators.TextAnalysis.qualityScore(col("text"))
              .as("quality"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("source"), col("rn").cast("long").as("rn"),
            col("doc_id"), col("quality"))
          .orderBy(col("source"), col("rn"))
      },
      {
        val tokensSql =
          """CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
            | ELSE string_split_regex(trim(lower(text)), '\s+') END""".stripMargin
        val sw = graft.operators.TextAnalysis.stopwordPattern(
          graft.operators.TextAnalysis.LangProfiles.en)
        val quality =
          s"""least(1.0, len($tokensSql) / 50.0)
             |    * (1.0 - least(1.0, len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) * 5.0))
             |    * least(1.0, len(regexp_extract_all(lower(text), '$sw')) / greatest(len($tokensSql), 1) * 10.0)""".stripMargin
        Some(s"""WITH q AS (
          |  SELECT doc_id, source, $quality AS quality
          |  FROM documents),
          |r AS (
          |  SELECT source, doc_id, quality,
          |    row_number() OVER (PARTITION BY source
          |                       ORDER BY quality DESC, doc_id) AS rn
          |  FROM q)
          |SELECT source, rn, doc_id, quality FROM r
          |WHERE rn <= 5
          |ORDER BY source, rn""".stripMargin)
      }),

    // Bloom-accelerated incremental ingestion: the ingested set is
    // the even customer keys, the incoming batch the %3 keys. Probes
    // reading definitely-absent skip the exact lookup; maybes verify
    // against the snapshot. might_contain (including deterministic
    // FPs) and the verified is_new both gate.
    "q113_bloom_ingest" -> Q(
      (s, dir) => {
        val nBits = 63 * 256
        val ingested = Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(concat(lit("c"), col("c_custkey")).as("k"))
        val incoming = Tables.customer(s, dir)
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), concat(lit("c"), col("c_custkey")).as("k"))
        Sketch.bloomNewKeys(ingested, incoming, "k", nBits, 3)
          .select(col("c_custkey"), col("k"), col("might_contain"),
            col("is_new"))
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
        |  FROM customer CROSS JOIN hs WHERE c_custkey % 3 = 0)
        |SELECT c_custkey, k,
        |  bool_and((coalesce(bm.bits, 0) & (1::BIGINT << CAST(p % 63 AS INT)))
        |           = (1::BIGINT << CAST(p % 63 AS INT))) AS might_contain,
        |  c_custkey % 2 = 1 AS is_new
        |FROM pp LEFT JOIN bm ON pp.p // 63 = bm.word_idx
        |GROUP BY 1, 2
        |ORDER BY c_custkey""".stripMargin)),

    // Sketch ALGEBRA: each sketch is built on two disjoint halves of
    // its stream and MERGED (CMS counters add, HLL registers max,
    // Bloom words OR); the oracle computes each sketch directly over
    // the whole stream — a green hash proves merge ≡ direct, the
    // property that lets sketches roll up across executors and days.
    "q115_sketch_merge" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(graft.operators.TextAnalysis.tokens(
              lower(col("text")))).as("t"))
        def cmsHalf(p: Int) = Sketch.countMin(
          toks.filter(col("doc_id") % 2 === p).select(col("t")),
          col("t"), d = 4, w = 8)
        val cms = Sketch.mergeCountMin(cmsHalf(0), cmsHalf(1))
          .select(lit("cms").as("kind"), col("row").as("k1"),
            col("bucket").as("k2"), col("cnt").as("v"))
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            concat(lit("o"), col("o_orderkey")).as("k"))
        def hllHalf(p: Int) = Sketch.hllRegisters(
          orders.filter(col("o_orderkey") % 2 === p).select(col("k")),
          col("k"), 64)
        val hll = Sketch.mergeHll(hllHalf(0), hllHalf(1))
          .select(lit("hll").as("kind"), col("idx").as("k1"),
            lit(-1L).as("k2"), col("max_rank").cast("long").as("v"))
        val nBits = 63 * 256
        val cust = Tables.customer(s, dir)
          .filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"),
            concat(lit("c"), col("c_custkey")).as("k"))
        def bloomHalf(p: Int) = Sketch.bloomBuild(
          cust.filter(col("c_custkey") % 4 === p).select(col("k")),
          col("k"), nBits, 3)
        val bloom = Sketch.mergeBloom(bloomHalf(0), bloomHalf(2))
          .select(lit("bloom").as("kind"), col("word_idx").as("k1"),
            lit(-1L).as("k2"), col("bits").as("v"))
        cms.unionByName(hll).unionByName(bloom)
          .orderBy(col("kind"), col("k1"), col("k2"))
      },
      {
        val P = Dedup.P
        val rows = Dedup.perms(4).zipWithIndex.map { case ((a, b), i) =>
          s"SELECT $i AS i, ((h * $a + $b) % $P) % 8 AS bucket FROM h"
        }.mkString("\n|    UNION ALL ")
        Some(s"""WITH tok AS (
          |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
          |                ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS t
          |  FROM documents),
          |h AS (SELECT CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % $P AS h FROM tok),
          |ctr AS (
          |  SELECT i, bucket, count(*) AS cnt FROM (
          |    $rows)
          |  GROUP BY i, bucket),
          |ok AS (
          |  SELECT CAST(('0x' || substr(md5('o' || o_orderkey), 1, 15)) AS BIGINT) AS h2
          |  FROM orders),
          |rk AS (
          |  SELECT h2 % 64 AS idx,
          |    CASE WHEN (h2 >> 6) = 0 THEN 55
          |         ELSE 55 - length(bin(h2 >> 6)) END AS rank
          |  FROM ok),
          |hll AS (SELECT idx, max(rank) AS r FROM rk GROUP BY 1),
          |hs AS (SELECT unnest([0, 1, 2]) AS i),
          |pos AS (
          |  SELECT CAST(('0x' || substr(md5('c' || c_custkey || ':b' || i), 1, 15)) AS BIGINT) % 16128 AS p
          |  FROM customer CROSS JOIN hs WHERE c_custkey % 2 = 0),
          |bm AS (
          |  SELECT p // 63 AS w,
          |         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
          |  FROM pos GROUP BY 1)
          |SELECT 'cms' AS kind, CAST(i AS BIGINT) AS k1, bucket AS k2,
          |       CAST(cnt AS BIGINT) AS v FROM ctr
          |UNION ALL
          |SELECT 'hll', idx, CAST(-1 AS BIGINT), CAST(r AS BIGINT) FROM hll
          |UNION ALL
          |SELECT 'bloom', w, CAST(-1 AS BIGINT), bits FROM bm
          |ORDER BY kind, k1, k2""".stripMargin)
      }),

    // Compression-ratio quality signal over every document — the ONE
    // query without a DuckDB oracle (no SQL-portable zlib exists), so
    // the driver records its weaker rows-only check; the behavioral
    // contract (repetitive ≪ natural < noise, determinism, emptiness)
    // is pinned in DeflateRatioSpec, and the classifier threshold
    // keeps the output deterministic for the rows-only gate.
    "q120_compression_quality" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.compressionRatio(col("text"))
            .as("comp_ratio"))
        .withColumn("is_repetitive", col("comp_ratio") < 0.35)
        .orderBy(col("doc_id")),
      None),

    // q120's companion: hash-gates everything about the compression-
    // quality signal that IS SQL-portable — the exact row universe
    // and ordering, DeflateRatio's denominator (UTF-8 byte length),
    // and a portable repetitiveness proxy (duplicate char-trigram
    // fraction in ppm, computed WITHOUT explode: one array projection
    // per row). Shrinks q120's unproven surface to the single
    // DeflateRatio column, which DeflateRatioSpec pins (incl.
    // codegen≡interpreted bit-identity).
    "q322_compression_quality_base" -> Q(
      (s, dir) => {
        val t = coalesce(col("text"), lit(""))
        val n = length(t)
        val grams = when(n >= 3,
            transform(sequence(lit(1), n - 2), i => substr(t, i, lit(3))))
          .otherwise(array().cast("array<string>"))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            octet_length(t).cast("long").as("raw_bytes"),
            grams.as("__g"))
          .select(col("doc_id"), col("raw_bytes"),
            size(col("__g")).cast("long").as("n_grams"),
            size(array_distinct(col("__g"))).cast("long").as("__d"))
          .withColumn("dup3_ppm",
            expr("(n_grams - __d) * 1000000L div greatest(n_grams, 1L)"))
          .drop("__d")
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
        |  SELECT doc_id,
        |    CAST(strlen(coalesce(text, '')) AS BIGINT) AS raw_bytes,
        |    CASE WHEN length(coalesce(text, '')) >= 3
        |         THEN list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))
        |         ELSE CAST([] AS VARCHAR[]) END AS l
        |  FROM documents)
        |SELECT doc_id, raw_bytes,
        |  CAST(len(l) AS BIGINT) AS n_grams,
        |  (CAST(len(l) AS BIGINT) - CAST(len(list_distinct(l)) AS BIGINT)) * 1000000
        |    // greatest(CAST(len(l) AS BIGINT), 1) AS dup3_ppm
        |FROM g ORDER BY doc_id""".stripMargin)),

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
        |ORDER BY idx""".stripMargin)),

    // Hybrid retrieval: keyword top-20 (conjunctive tf-sum) fused with
    // vector top-20 (cosine vs vec 0) by reciprocal-rank fusion.
    // Contributions ride as 1000000 div (60 + rank) ppm — positive
    // integer truncation, identical in Spark `div` and DuckDB `//` —
    // so the fused ranking hash-matches. vec_id and doc_id share the
    // id space (one embedding per document).
    "q125_hybrid_rrf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = Search.termFrequencies(
          Tables.documents(s, dir), "doc_id", "text")
        val kw = Search.searchAll(tf, Seq("spark", "join"), 20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank"))
        val e = Tables.embeddings(s, dir)
        val q0 = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        // top-20 via orderBy+limit (distributed TakeOrdered), THEN the
        // rank window over the 20 survivors — never a corpus-wide
        // single-partition window
        val vec = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .withColumn("cos",
            Similarity.cosineNative(col("qv"), col("embedding")))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cos").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rank"))
        Search.rrfFuse(Seq(kw, vec), 15)
          .orderBy(col("rrf_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH $tfCte,
        |m AS (
        |  SELECT doc_id, count(*) AS nm, CAST(sum(tf) AS BIGINT) AS score
        |  FROM tf WHERE token IN ('spark', 'join') GROUP BY 1),
        |kw AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM (SELECT doc_id, score FROM m WHERE nm = 2
        |        ORDER BY score DESC, doc_id LIMIT 20)),
        |e AS (SELECT vec_id, ${SimilarityQueries.vSql} AS v FROM embeddings),
        |q0 AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id, ${SimilarityQueries.cosSql("qv", "v")} AS cos
        |       FROM e CROSS JOIN q0 WHERE e.vec_id <> 0),
        |vec AS (
        |  SELECT vec_id AS doc_id,
        |    row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
        |  FROM (SELECT vec_id, cos FROM sc
        |        ORDER BY cos DESC, vec_id LIMIT 20)),
        |u AS (SELECT doc_id, 1000000 // (60 + rank) AS contrib FROM kw
        |      UNION ALL
        |      SELECT doc_id, 1000000 // (60 + rank) FROM vec)
        |SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_ppm,
        |  count(*) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_ppm DESC, doc_id LIMIT 15""".stripMargin)),

    // Winnowing fingerprints (MOSS): per-doc k-gram hashes, min of
    // each w-window selected on the (hash, pos) total order, distinct
    // winners. The oracle replays shingling with positions, the same
    // lpad-hex window key, and the same window frame.
    "q127_winnow_fingerprints" -> Q(
      (s, dir) => Dedup.winnowFingerprints(
          Tables.documents(s, dir), "doc_id", "text", k = 3, w = 4)
        .orderBy(col("doc_id"), col("pos")),
      Some(s"""WITH $winnowSelCte
        |SELECT doc_id,
        |  CAST(('0x' || substr(wmin, 1, 15)) AS BIGINT) AS fp_hash,
        |  CAST(substr(wmin, 16, 10) AS INT) AS pos
        |FROM sel
        |ORDER BY doc_id, pos""".stripMargin)),

    // Exact per-source token-length quantiles (nearest-rank): the
    // corpus length profile curation reads before choosing chunk
    // sizes. Integer-deterministic given the (value, doc_id) total
    // sort key and the shared ceil(p·n) rank formula.
    "q128_length_quantiles" -> Q(
      (s, dir) => {
        import graft.operators.{Corpus, TextAnalysis}
        Corpus.exactQuantiles(
            Tables.documents(s, dir).select(col("doc_id"), col("source"),
              size(TextAnalysis.tokens(col("text"))).cast("long")
                .as("n_tokens")),
            "source", "n_tokens", "doc_id", Seq(0.5, 0.9, 0.99))
          .orderBy(col("source"))
      },
      Some(s"""WITH $toksCte,
        |l AS (SELECT t.doc_id, d.source, len(t.toks) AS n_tokens
        |      FROM t JOIN documents d ON t.doc_id = d.doc_id),
        |r AS (SELECT source, doc_id, n_tokens,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_tokens, doc_id) AS rnk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM l)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |  max(CASE WHEN rnk = ceil(0.5 * n) THEN n_tokens END) AS q_50,
        |  max(CASE WHEN rnk = ceil(0.9 * n) THEN n_tokens END) AS q_90,
        |  max(CASE WHEN rnk = ceil(0.99 * n) THEN n_tokens END) AS q_99
        |FROM r GROUP BY source
        |ORDER BY source""".stripMargin)),

    // MOSS composition: near-dup CANDIDATE pairs = docs sharing >= 2
    // surviving winnow fingerprints (fingerprints in > 10 docs are
    // boilerplate and dropped — which also bounds the self-join).
    "q129_winnow_near_dup" -> Q(
      (s, dir) => Dedup.winnowNearDupCandidates(
          Tables.documents(s, dir), "doc_id", "text",
          k = 3, w = 4, maxDf = 10, minShared = 2)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $winnowSelCte,
        |fpd AS (SELECT DISTINCT doc_id,
        |          CAST(('0x' || substr(wmin, 1, 15)) AS BIGINT) AS fp_hash
        |        FROM sel),
        |dfc AS (SELECT fp_hash, count(*) AS df FROM fpd GROUP BY 1),
        |kept AS (SELECT fpd.doc_id, fpd.fp_hash
        |         FROM fpd JOIN dfc USING (fp_hash) WHERE df <= 10),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM kept a JOIN kept b USING (fp_hash)
        |       WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, count(*) AS n_shared
        |FROM pr GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin)),

    // Exact-substring dedup signal (Lee et al. 2022) without a suffix
    // array: L-token shingle anchors shared by >= 2 docs, coalesced
    // into maximal per-doc duplicated spans. L=5 so the synthetic
    // corpus' repeated sentences surface as spans, not noise.
    "q133_dup_spans" -> Q(
      (s, dir) => Dedup.dupSpans(
          Tables.documents(s, dir), "doc_id", "text", spanTokens = 5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
        |      AS BIGINT) AS h
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 4)) AS i
        |        FROM toks WHERE len(t) >= 5)),
        |dfh AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |                       FROM sh GROUP BY h) WHERE nd >= 2),
        |dup AS (SELECT doc_id, pos FROM sh JOIN dfh USING (h)),
        |br AS (SELECT doc_id, pos,
        |    CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |                 + 5 THEN 1 ELSE 0 END AS brk
        |  FROM dup),
        |sp AS (SELECT doc_id, sid,
        |    CAST(max(pos) + 5 - min(pos) AS BIGINT) AS span_tokens
        |  FROM (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
        |        FROM br)
        |  GROUP BY doc_id, sid),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |    CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
        |    CAST(max(span_tokens) AS BIGINT) AS max_span_tokens
        |  FROM sp GROUP BY doc_id)
        |SELECT d.doc_id, d.n_tokens,
        |  COALESCE(pd.n_dup_spans, 0) AS n_dup_spans,
        |  COALESCE(pd.dup_tokens, 0) AS dup_tokens,
        |  COALESCE(pd.max_span_tokens, 0) AS max_span_tokens,
        |  CASE WHEN d.n_tokens > 0
        |       THEN (1000000 * COALESCE(pd.dup_tokens, 0)) // d.n_tokens
        |       ELSE 0 END AS dup_ppm
        |FROM d LEFT JOIN pd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // Whole-corpus token-length quantiles WITHOUT a global sort: the
    // value-range bisection path (one partial-agg pass per bisection
    // round). Same nearest-rank definition as q128, one global row.
    "q134_quantiles_bisect" -> Q(
      (s, dir) => {
        import graft.operators.{Corpus, TextAnalysis}
        Corpus.quantilesBisect(
          Tables.documents(s, dir).select(
            size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
          "n_tokens", Seq(0.5, 0.9, 0.99))
      },
      Some(s"""WITH $toksCte,
        |l AS (SELECT len(toks) AS n_tokens FROM t
        |      WHERE toks IS NOT NULL),
        |r AS (SELECT n_tokens,
        |    row_number() OVER (ORDER BY n_tokens) AS rnk,
        |    count(*) OVER () AS n
        |  FROM l)
        |SELECT CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(max(CASE WHEN rnk = ceil(0.5 * n) THEN n_tokens END)
        |    AS BIGINT) AS q_50,
        |  CAST(max(CASE WHEN rnk = ceil(0.9 * n) THEN n_tokens END)
        |    AS BIGINT) AS q_90,
        |  CAST(max(CASE WHEN rnk = ceil(0.99 * n) THEN n_tokens END)
        |    AS BIGINT) AS q_99
        |FROM r""".stripMargin)),

    // Interpolated trigram-LM scoring (Jelinek–Mercer with fixed
    // integer weights 5/3/2): the higher-order analog of q100's
    // bigram surprise — three vocabulary-bounded model tables, then a
    // distinct-trigram join per doc. Integer ppm end-to-end.
    "q135_trigram_interp" -> Q(
      (s, dir) => LanguageModel.trigramInterpolated(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH lt AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |u AS (SELECT w, count(*) AS cu
        |      FROM (SELECT unnest(t) AS w FROM lt) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM u),
        |bg AS (SELECT t[i] AS b1, t[i+1] AS b2, count(*) AS cb
        |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |             FROM lt WHERE len(t) >= 2) GROUP BY 1, 2),
        |tg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        |       FROM (SELECT doc_id, t,
        |               unnest(generate_series(1, len(t) - 2)) AS i
        |             FROM lt WHERE len(t) >= 3)),
        |c3 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg GROUP BY 1, 2, 3),
        |dt AS (SELECT doc_id, w1, w2, w3, count(*) AS cd
        |       FROM tg GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT dt.doc_id, dt.cd,
        |    (5 * COALESCE((1000000 * c3.c123) // m12.cb, 0)
        |     + 3 * COALESCE((1000000 * m23.cb) // u2.cu, 0)
        |     + 2 * COALESCE((1000000 * u3.cu) // tot.n_total, 0)) // 10
        |      AS ppm
        |  FROM dt
        |  LEFT JOIN c3 USING (w1, w2, w3)
        |  LEFT JOIN bg m12 ON m12.b1 = dt.w1 AND m12.b2 = dt.w2
        |  LEFT JOIN bg m23 ON m23.b1 = dt.w2 AND m23.b2 = dt.w3
        |  LEFT JOIN u u2 ON u2.w = dt.w2
        |  LEFT JOIN u u3 ON u3.w = dt.w3
        |  CROSS JOIN tot),
        |pd AS (SELECT doc_id, CAST(sum(cd) AS BIGINT) AS n_trigrams,
        |    CAST(sum(cd * ppm) AS BIGINT) AS interp_ppm_sum,
        |    CAST(min(ppm) AS BIGINT) AS min_interp_ppm
        |  FROM sc GROUP BY 1)
        |SELECT d.doc_id, COALESCE(pd.n_trigrams, 0) AS n_trigrams,
        |  COALESCE(pd.interp_ppm_sum, 0) AS interp_ppm_sum,
        |  COALESCE(pd.min_interp_ppm, 0) AS min_interp_ppm
        |FROM documents d LEFT JOIN pd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // Domain-level corpus governance: parse host/registrable domain
    // from (synthesized) per-doc URLs, drop blocklisted domains, and
    // roll up doc/host/token counts per domain. The oracle derives
    // host and domain from the GENERATOR arithmetic, so Spark's URL
    // parsing chain is checked against ground truth, not re-parsed.
    "q137_domain_stats" -> Q(
      (s, dir) => {
        import graft.operators.TextAnalysis
        val d = col("doc_id")
        val url = concat(lit("https://"),
          when(d % 5 === 0, lit("www."))
            .otherwise(concat(lit("crawl"), d % 3, lit("."))),
          lit("site"), d % 7, lit(".com/page/"), d)
        Tables.documents(s, dir)
          .select(d, size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_toks"), url.as("url"))
          .withColumn("host", Urls.host(col("url")))
          .withColumn("domain", Urls.registrableDomain(col("host")))
          .filter(!col("domain").isin("site1.com", "site4.com"))
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"),
            sum(col("n_toks")).as("n_tokens"))
          .orderBy(col("domain"))
      },
      Some(s"""WITH $toksCte,
        |d AS (SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_toks,
        |    CASE WHEN t.doc_id % 5 = 0
        |         THEN 'site' || (t.doc_id % 7) || '.com'
        |         ELSE 'crawl' || (t.doc_id % 3) || '.site' ||
        |              (t.doc_id % 7) || '.com' END AS host,
        |    'site' || (t.doc_id % 7) || '.com' AS domain
        |  FROM t)
        |SELECT domain, count(*) AS n_docs,
        |  count(DISTINCT host) AS n_hosts,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |FROM d
        |WHERE domain NOT IN ('site1.com', 'site4.com')
        |GROUP BY domain
        |ORDER BY domain""".stripMargin)),

    // Corpus diversity monitoring: per-source trigram type-token ratio
    // (distinct / total n-grams in ppm) — the Self-BLEU-adjacent
    // signal that flags template-heavy or mode-collapsed sources.
    // Vocabulary-bounded partial aggs; n-gram keys ride the native
    // shingle scan.
    "q139_ngram_diversity" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val tg = docs.select(col("source"),
            explode(LanguageModel.ngramKeys(col("text"), 3)).as("tg"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("total_trigrams"),
            countDistinct(col("tg")).as("distinct_trigrams"))
        base.join(tg, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("total_trigrams"), lit(0L)).as("total_trigrams"),
            coalesce(col("distinct_trigrams"), lit(0L))
              .as("distinct_trigrams"),
            when(coalesce(col("total_trigrams"), lit(0L)) > 0,
              expr("(1000000 * distinct_trigrams) div total_trigrams"))
              .otherwise(lit(0L)).as("ttr_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH lt AS (
        |  SELECT source,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |tg AS (SELECT source, array_to_string(t[i:i+2], ' ') AS tg
        |       FROM (SELECT source, t,
        |               unnest(generate_series(1, len(t) - 2)) AS i
        |             FROM lt WHERE len(t) >= 3)),
        |g AS (SELECT source, count(*) AS total_trigrams,
        |        count(DISTINCT tg) AS distinct_trigrams
        |      FROM tg GROUP BY source),
        |b AS (SELECT source, count(*) AS n_docs FROM documents
        |      GROUP BY source)
        |SELECT b.source, b.n_docs,
        |  COALESCE(g.total_trigrams, 0) AS total_trigrams,
        |  COALESCE(g.distinct_trigrams, 0) AS distinct_trigrams,
        |  CASE WHEN COALESCE(g.total_trigrams, 0) > 0
        |       THEN (1000000 * g.distinct_trigrams) // g.total_trigrams
        |       ELSE 0 END AS ttr_ppm
        |FROM b LEFT JOIN g USING (source)
        |ORDER BY source""".stripMargin)),

    // Cross-source exact-overlap matrix: how many canonical-text
    // fingerprints two sources share (diagonal = a source's distinct
    // fingerprint count). The leakage/contamination dashboard between
    // corpus slices — one fingerprint-keyed self-join over the
    // DISTINCT (source, fp) frame, never doc×doc.
    "q140_source_overlap" -> Q(
      (s, dir) => {
        import graft.operators.TextAnalysis
        val fps = Tables.documents(s, dir)
          .select(col("source"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .distinct()
        fps.select(col("source").as("src_a"), col("fp"))
          .join(fps.select(col("source").as("src_b"), col("fp")), "fp")
          .filter(col("src_a") <= col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH f AS (
        |  SELECT DISTINCT source, md5(array_to_string(
        |      string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
        |      ' ')) AS fp
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.source <= b.source
        |GROUP BY 1, 2
        |ORDER BY src_a, src_b""".stripMargin)),

    // Data-skipping zonemap: per-shard min/max/count for two
    // clustering keys plus range pruning — the file-stats index a
    // 100 TB writer persists so scans open only intersecting shards.
    // min/max of doubles are exact picks (never accumulated), so the
    // double columns hash-gate safely.
    "q142_zonemap" -> Q(
      (s, dir) => {
        import graft.operators.Corpus
        val zm = Corpus.zonemap(Tables.lineitem(s, dir),
          expr("l_orderkey div 4000"), Seq("l_quantity", "l_extendedprice"))
        Corpus.pruneRange(zm, "l_extendedprice", lit(1000.0), lit(50000.0))
          .orderBy(col("shard"))
      },
      Some("""SELECT l_orderkey // 4000 AS shard, count(*) AS n_rows,
        |  min(l_quantity) AS min_l_quantity,
        |  max(l_quantity) AS max_l_quantity,
        |  min(l_extendedprice) AS min_l_extendedprice,
        |  max(l_extendedprice) AS max_l_extendedprice,
        |  (max(l_extendedprice) < 1000.0 OR min(l_extendedprice) > 50000.0)
        |    AS can_skip
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY shard""".stripMargin)),

    // Held-out-set integrity: fingerprints straddling hash-split
    // partitions (splits key on doc_id, so textual dups with distinct
    // ids CAN leak train→test). Same split arithmetic as q79, same
    // canonical fingerprint as q25. The corpus' own dups happen to
    // co-split at this sf, so 50 cross-id duplicates are planted
    // (identical text under shifted ids) to make the gate
    // non-trivial.
    "q147_split_leakage" -> Q(
      (s, dir) => {
        import graft.operators.Corpus
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        Corpus.splitLeakage(planted, "doc_id", "text",
            "v1", Seq(("train", 8), ("val", 1), ("test", 1)))
          .orderBy(col("fp"))
      },
      Some("""WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50),
        |s AS (
        |  SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
        |              ELSE 'test' END AS split,
        |    md5(array_to_string(string_split_regex(
        |      trim(lower(coalesce(text, ''))), '\s+'), ' ')) AS fp
        |  FROM (SELECT text,
        |          CAST(('0x' || substr(md5(doc_id || ':v1'), 1, 15))
        |            AS BIGINT) % 10 AS b
        |        FROM u))
        |SELECT fp, count(*) AS n_docs,
        |  count(DISTINCT split) AS n_splits,
        |  array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
        |FROM s GROUP BY fp
        |HAVING count(DISTINCT split) > 1
        |ORDER BY fp""".stripMargin)),

    // Per-source vocabulary signature: top-5 terms by frequency with
    // deterministic ties — the corpus-drift dashboard row. The window
    // runs over the aggregated (source, term) frame, never raw rows.
    "q148_top_terms_by_source" -> Q(
      (s, dir) => graft.operators.Search.topTermsPerGroup(
          Tables.documents(s, dir), "source", "text", 5)
        .select(col("grp").as("source"), col("term"), col("tf"),
          col("rank"))
        .orderBy(col("source"), col("rank")),
      Some("""WITH tf AS (
        |  SELECT source, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT source, unnest(
        |          CASE WHEN trim(lower(text)) = ''
        |               THEN CAST([] AS VARCHAR[])
        |               ELSE string_split_regex(trim(lower(text)), '\s+')
        |          END) AS t
        |        FROM documents)
        |  GROUP BY 1, 2),
        |r AS (SELECT source, term, tf,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY tf DESC, term) AS BIGINT) AS rank
        |  FROM tf)
        |SELECT source, term, tf, rank FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin)),

    // Collocation mining: top-50 bigrams by LIFT (exp-PMI, integer
    // ppm — monotone in PMI so rankings agree engine-to-engine) with
    // a min-count floor. The phrase / tokenizer-merge-candidate
    // signal over the corpus.
    "q152_bigram_lift" -> Q(
      (s, dir) => LanguageModel.bigramLift(
          Tables.documents(s, dir).select(col("text")), "text",
          minCount = 5L)
        .orderBy(col("lift_ppm").desc, col("bg"))
        .limit(50),
      Some("""WITH lt AS (
        |  SELECT CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |u AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
        |      FROM (SELECT unnest(t) AS w FROM lt) GROUP BY 1),
        |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM u),
        |bl AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM (SELECT t[i] AS w1, t[i+1] AS w2
        |        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |              FROM lt WHERE len(t) >= 2))
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w1 || ' ' || w2 AS bg, c12, u1.cu AS c1, u2.cu AS c2,
        |  (1000000 * c12 * n_total) // (u1.cu * u2.cu) AS lift_ppm
        |FROM bl
        |JOIN u u1 ON u1.w = bl.w1
        |JOIN u u2 ON u2.w = bl.w2
        |CROSS JOIN tot
        |ORDER BY lift_ppm DESC, bg
        |LIMIT 50""".stripMargin)),

    // Eval-set construction: exactly 3 docs per source chosen by
    // md5-hash order — reproducible across runs/engines, ties to the
    // smaller id (the hashSplit determinism contract, per-group).
    "q155_stratified_sample" -> Q(
      (s, dir) => {
        import graft.operators.Corpus
        Corpus.stratifiedSample(
            Tables.documents(s, dir).select(col("doc_id"), col("source")),
            "source", "doc_id", "ev1", 3)
          .orderBy(col("source"), col("sample_rank"))
      },
      Some("""WITH r AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY CAST(('0x' || substr(md5(doc_id || ':ev1'), 1, 15))
        |                 AS BIGINT), doc_id) AS BIGINT) AS sample_rank
        |  FROM documents)
        |SELECT source, doc_id, sample_rank
        |FROM r WHERE sample_rank <= 3
        |ORDER BY source, sample_rank""".stripMargin)),

    // The bisection quantile as a FILTER THRESHOLD: drop (here:
    // surface) docs beyond the corpus p99 token length — the
    // two-phase outlier-trim pattern (one bisection pass computes the
    // cut, one scan applies it) that replaces a global sort at 100 TB.
    "q156_outlier_filter" -> Q(
      (s, dir) => {
        import graft.operators.{Corpus, TextAnalysis}
        val lens = Tables.documents(s, dir).select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        val p99 = Corpus.quantilesBisect(lens, "n_tokens", Seq(0.99))
          .collect()(0).getLong(1)
        lens.filter(col("n_tokens") > p99).orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksCte,
        |l AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t
        |      WHERE toks IS NOT NULL),
        |r AS (SELECT n_tokens,
        |    row_number() OVER (ORDER BY n_tokens) AS rnk,
        |    count(*) OVER () AS n
        |  FROM l),
        |p AS (SELECT max(CASE WHEN rnk = ceil(0.99 * n) THEN n_tokens END)
        |        AS p99 FROM r)
        |SELECT doc_id, n_tokens
        |FROM l CROSS JOIN p
        |WHERE n_tokens > p99
        |ORDER BY doc_id""".stripMargin)),

    // Per-doc keyword extraction on a doc sample: top-3 terms by the
    // integer TF-IDF surrogate 1e6·tf/df (df over the FULL corpus,
    // so common words rank out; the constant N is dropped — same
    // ranking, overflow-free), ties to the smaller term.
    "q165_tfidf_keywords" -> Q(
      (s, dir) => graft.operators.Search.keywordsPerDoc(
          Tables.documents(s, dir), "doc_id", "text", 3)
        .filter(col("doc_id") % 50 === 0)
        .orderBy(col("doc_id"), col("rank")),
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |    AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |        FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |    (1000000 * tf.tf) // dfq.df AS score_ppm
        |  FROM tf JOIN dfq USING (term)),
        |r AS (SELECT doc_id, term, tf, df, score_ppm,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_ppm DESC, term) AS BIGINT) AS rank
        |  FROM sc)
        |SELECT doc_id, rank, term, tf, df, score_ppm
        |FROM r WHERE rank <= 3 AND doc_id % 50 = 0
        |ORDER BY doc_id, rank""".stripMargin)),

    // DSIR-style importance weighting in exact integer form: target =
    // English documents; weight_ppm(t) = ⌊1e6·c_target(t)/c_all(t)⌋
    // over corpus term counts; doc score = Σ token weights. The
    // data-selection prior that upsamples target-like text.
    "q171_importance_weights" -> Q(
      (s, dir) => graft.operators.Corpus.importanceWeights(
          Tables.documents(s, dir), "doc_id", "text",
          col("lang") === "en")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, tgt, unnest(toks) AS tk FROM t),
        |w AS (SELECT tk,
        |    (1000000 * CAST(count(CASE WHEN tgt THEN 1 END) AS BIGINT))
        |      // CAST(count(*) AS BIGINT) AS w_ppm
        |  FROM tok GROUP BY tk),
        |pd AS (SELECT tok.doc_id, count(*) AS n_tokens,
        |    CAST(sum(w.w_ppm) AS BIGINT) AS score_ppm
        |  FROM tok JOIN w USING (tk) GROUP BY tok.doc_id)
        |SELECT d.doc_id,
        |  coalesce(pd.n_tokens, 0) AS n_tokens,
        |  coalesce(pd.score_ppm, 0) AS score_ppm
        |FROM documents d LEFT JOIN pd USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Deterministic weighted sampling without replacement (integer
    // A-ES): priority = h60(id:salt) div weight, keep the 3 smallest
    // per source. Longer documents (weight = n_chars) are
    // proportionally likelier — the length-weighted corpus draw.
    "q172_weighted_sample" -> Q(
      (s, dir) => graft.operators.Corpus.weightedPrioritySample(
          Tables.documents(s, dir).select(
            col("doc_id"), col("source"), col("n_chars")),
          "doc_id", "n_chars", "source", k = 3, salt = "ws1")
        .orderBy(col("source"), col("rn")),
      Some("""WITH p AS (SELECT source, doc_id,
        |    CAST(('0x' || substr(md5(doc_id || ':ws1'), 1, 15)) AS BIGINT)
        |      // n_chars AS priority
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT source, doc_id, priority,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY priority, doc_id) AS BIGINT) AS rn
        |  FROM p)
        |SELECT source, rn, doc_id, priority
        |FROM r WHERE rn <= 3
        |ORDER BY source, rn""".stripMargin)),

    // Tokenizer-fit audit: top-100 corpus vocabulary (frequency desc,
    // token asc — fully deterministic), per-source OOV rate in ppm.
    "q177_vocab_coverage" -> Q(
      (s, dir) => graft.operators.TextAnalysis.vocabCoverage(
          Tables.documents(s, dir), "text", "source", vocabSize = 100)
        .orderBy(col("source")),
      Some("""WITH t AS (
        |  SELECT source,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT source, unnest(toks) AS tk FROM t),
        |v AS (SELECT tk FROM (
        |    SELECT tk, count(*) AS c FROM tok GROUP BY tk
        |    ORDER BY c DESC, tk LIMIT 100)),
        |j AS (SELECT tok.source, v.tk AS hit
        |      FROM tok LEFT JOIN v ON tok.tk = v.tk)
        |SELECT source, count(*) AS n_tokens,
        |  count(CASE WHEN hit IS NULL THEN 1 END) AS n_oov,
        |  (1000000 * count(CASE WHEN hit IS NULL THEN 1 END)) // count(*)
        |    AS oov_ppm
        |FROM j GROUP BY source
        |ORDER BY source""".stripMargin)),

    // Feature-correlation audit in exact sufficient statistics:
    // char length vs token count per source — n, Σx, Σy, Σx², Σy²,
    // Σxy and the covariance numerator, all BIGINT (Pearson r derives
    // from these; its sqrt stays out of the gate by design).
    "q184_corr_stats" -> Q(
      (s, dir) => graft.operators.Aggregates.corrStats(
          Tables.documents(s, dir)
            .withColumn("n_tok",
              graft.operators.TextAnalysis.nTokens(col("text"))),
          "source", col("n_chars"), col("n_tok"))
        .orderBy(col("source")),
      Some("""WITH d AS (SELECT source,
        |    CAST(n_chars AS BIGINT) AS x,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+'))
        |    END AS BIGINT) AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL)
        |SELECT source, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x,
        |  CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * x) AS BIGINT) AS sum_xx,
        |  CAST(sum(y * y) AS BIGINT) AS sum_yy,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  count(*) * CAST(sum(x * y) AS BIGINT)
        |    - CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT) AS cov_num
        |FROM d GROUP BY source
        |ORDER BY source""".stripMargin)),

    // Largest-remainder (Hamilton) quota allocation: 100 eval slots
    // split across sources proportionally to doc count, remainders
    // ranked exactly (mod-N integers, no division error). Σ quota
    // must equal the total by construction.
    "q185_quota_allocation" -> Q(
      (s, dir) => graft.operators.Corpus.quotaAllocation(
          Tables.documents(s, dir), "source", total = 100L)
        .orderBy(col("source")),
      Some("""WITH c AS (SELECT source, count(*) AS n_rows
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS N FROM c),
        |b AS (SELECT source, n_rows,
        |    (n_rows * 100) // N AS base, (n_rows * 100) % N AS rem
        |  FROM c, t),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT)
        |      AS rk,
        |    100 - sum(base) OVER () AS spare
        |  FROM b)
        |SELECT source, n_rows,
        |  base + CASE WHEN rk <= spare THEN 1 ELSE 0 END AS quota
        |FROM r
        |ORDER BY source""".stripMargin)),

    // Bloom-prefiltered join: the build side's key bitmap applied as
    // a SCAN-SPEED predicate on the probe scan before any shuffle —
    // the 100 TB shape when the build side is too big to broadcast
    // as a hash relation but its Bloom bitmap is KBs. The oracle is
    // the PLAIN join: no false negatives means the prefilter can
    // only drop rows the join would drop anyway, so a green hash
    // proves the optimization preserves the exact result (false
    // positives cost selectivity, never correctness).
    "q205_bloom_prefilter_join" -> Q(
      (s, dir) => {
        val nBits = 63 * 256
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        val bloom = Sketch.bloomBuild(urgent,
          col("o_orderkey").cast("string"), nBits, 3)
        val pred = Sketch.bloomFilterScan(bloom,
          col("l_orderkey").cast("string"), nBits, 3)
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"))
          .filter(pred)
          .join(urgent, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1
        |ORDER BY l_orderkey""".stripMargin)),

    // Greedy longest-match subword encode (the WordPiece inference
    // path) with a corpus-induced char-n-gram vocabulary — run over
    // the DISTINCT-words table (the Zipf optimization), so both the
    // induction and the 16-step encode state machine are
    // vocabulary-bounded. The oracle replays the top-64 piece
    // induction and the identical greedy fold as a struct-state
    // list_reduce.
    "q215_greedy_encode" -> Q(
      (s, dir) => {
        import graft.operators.TextAnalysis
        val words = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(lower(col("text"))))
            .as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val pieces = Bpe.charNgramVocab(words, "word", "cnt",
          maxPieceLen = 4, topM = 64)
        Bpe.greedyEncode(words, "word", pieces)
          .select(col("word"), col("cnt"), col("n_pieces"), col("n_unk"))
          .orderBy(col("word"))
      },
      Some {
        val matchCase = (4 to 2 by -1).map { l =>
          s"""WHEN length(word) - acc.pos >= ${l - 1}
          |          AND list_contains(vl, substr(word, acc.pos, $l))
          |          THEN {'pos': acc.pos + $l, 'np': acc.np + 1, 'unk': acc.unk}""".stripMargin
        }.mkString("\n        ")
        s"""WITH words AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(CASE WHEN trim(lower(text)) = ''
        |        THEN CAST([] AS VARCHAR[])
        |        ELSE string_split_regex(trim(lower(text)), '\\s+') END)
        |      AS word
        |    FROM documents)
        |  GROUP BY word),
        |pp AS (SELECT word, cnt,
        |    unnest(generate_series(1, length(word))) AS pos FROM words),
        |pl AS (SELECT word, cnt, pos, unnest([1, 2, 3, 4]) AS l FROM pp),
        |pcs AS (SELECT substr(word, pos, l) AS piece, sum(cnt) AS t
        |  FROM pl WHERE pos + l - 1 <= length(word) GROUP BY 1),
        |vlt AS (SELECT list(piece) AS vl FROM (
        |  SELECT piece FROM pcs ORDER BY t DESC, piece LIMIT 64)),
        |enc AS (SELECT word, cnt,
        |  list_reduce(
        |    [{'pos': 1, 'np': 0, 'unk': 0}] ||
        |      list_transform(range(1, 17), i -> {'pos': 0, 'np': 0, 'unk': 0}),
        |    (acc, x) -> CASE WHEN acc.pos > length(word) THEN acc
        |      ELSE (CASE
        |        $matchCase
        |        WHEN list_contains(vl, substr(word, acc.pos, 1))
        |          THEN {'pos': acc.pos + 1, 'np': acc.np + 1, 'unk': acc.unk}
        |        ELSE {'pos': acc.pos + 1, 'np': acc.np, 'unk': acc.unk + 1}
        |        END)
        |      END) AS st
        |  FROM words CROSS JOIN vlt)
        |SELECT word, cnt, CAST(st.np AS BIGINT) AS n_pieces,
        |  CAST(st.unk AS BIGINT) AS n_unk
        |FROM enc
        |ORDER BY word""".stripMargin
      }),

    // Tokenizer-migration drift: the SAME word frame encoded under
    // the incumbent 64-piece vocab and a candidate 32-piece vocab,
    // per-word piece/unk deltas — the artifact that prices a
    // tokenizer swap (sequence-length growth = compute growth)
    // before committing to one. Both greedy folds replay in-oracle.
    "q404_tokenizer_drift" -> Q(
      (s, dir) => {
        import graft.operators.TextAnalysis
        val words = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(lower(col("text"))))
            .as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val a = Bpe.greedyEncode(words, "word",
            Bpe.charNgramVocab(words, "word", "cnt", 4, topM = 64))
          .select(col("word"), col("cnt"),
            col("n_pieces").as("np_a"), col("n_unk").as("unk_a"))
        val b = Bpe.greedyEncode(words, "word",
            Bpe.charNgramVocab(words, "word", "cnt", 4, topM = 32))
          .select(col("word"), col("n_pieces").as("np_b"),
            col("n_unk").as("unk_b"))
        a.join(b, "word")
          .withColumn("piece_delta", col("np_b") - col("np_a"))
          .orderBy(col("word"))
      },
      Some {
        def matchCase(vl: String) = (4 to 2 by -1).map { l =>
          s"""WHEN length(word) - acc.pos >= ${l - 1}
          |          AND list_contains($vl, substr(word, acc.pos, $l))
          |          THEN {'pos': acc.pos + $l, 'np': acc.np + 1, 'unk': acc.unk}""".stripMargin
        }.mkString("\n        ")
        def encCte(name: String, vlt: String, vl: String) =
          s"""$name AS (SELECT word, cnt,
          |  list_reduce(
          |    [{'pos': 1, 'np': 0, 'unk': 0}] ||
          |      list_transform(range(1, 17), i -> {'pos': 0, 'np': 0, 'unk': 0}),
          |    (acc, x) -> CASE WHEN acc.pos > length(word) THEN acc
          |      ELSE (CASE
          |        ${matchCase(vl)}
          |        WHEN list_contains($vl, substr(word, acc.pos, 1))
          |          THEN {'pos': acc.pos + 1, 'np': acc.np + 1, 'unk': acc.unk}
          |        ELSE {'pos': acc.pos + 1, 'np': acc.np, 'unk': acc.unk + 1}
          |        END)
          |      END) AS st
          |  FROM words CROSS JOIN $vlt)""".stripMargin
        s"""WITH words AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(CASE WHEN trim(lower(text)) = ''
        |        THEN CAST([] AS VARCHAR[])
        |        ELSE string_split_regex(trim(lower(text)), '\\s+') END)
        |      AS word
        |    FROM documents)
        |  GROUP BY word),
        |pp AS (SELECT word, cnt,
        |    unnest(generate_series(1, length(word))) AS pos FROM words),
        |pl AS (SELECT word, cnt, pos, unnest([1, 2, 3, 4]) AS l FROM pp),
        |pcs AS (SELECT substr(word, pos, l) AS piece, sum(cnt) AS t
        |  FROM pl WHERE pos + l - 1 <= length(word) GROUP BY 1),
        |va AS (SELECT list(piece) AS vla FROM (
        |  SELECT piece FROM pcs ORDER BY t DESC, piece LIMIT 64)),
        |vb AS (SELECT list(piece) AS vlb FROM (
        |  SELECT piece FROM pcs ORDER BY t DESC, piece LIMIT 32)),
        |${encCte("ea", "va", "vla")},
        |${encCte("eb", "vb", "vlb")}
        |SELECT ea.word, ea.cnt,
        |  CAST(ea.st.np AS BIGINT) AS np_a,
        |  CAST(ea.st.unk AS BIGINT) AS unk_a,
        |  CAST(eb.st.np AS BIGINT) AS np_b,
        |  CAST(eb.st.unk AS BIGINT) AS unk_b,
        |  CAST(eb.st.np - ea.st.np AS BIGINT) AS piece_delta
        |FROM ea JOIN eb USING (word)
        |ORDER BY ea.word""".stripMargin
      }),

    // KMV (k-minimum-values) distinct sketch with split-and-merge:
    // the corpus is sketched as two halves (doc_id parity) that MERGE
    // into one register table — the oracle replays the WHOLE stream
    // directly, so a green hash proves the merge algebra exactly
    // (mergeKmv(A, B) ≡ kmv(A ∪ B); the q115 discipline). Registers
    // are exact integers; the estimate is exact below saturation and
    // (k−1)·2^60/h_k above it — one exact double product (15·2^60 is
    // a 4-bit mantissa) and one IEEE division, engine-stable.
    "q243_kmv_sketch" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def sketchHalf(even: Boolean) = Sketch.kmvBy(
          docs.filter((col("doc_id") % 2 === 0) === even),
          col("source"), col("text"), k = 16)
        val merged = Sketch.mergeKmv(sketchHalf(true), sketchHalf(false), 16)
        merged.join(Sketch.kmvEstimate(merged, 16), Seq("grp"))
          .select(col("grp"), col("rn"), col("h"), col("n_regs"), col("est"))
          .orderBy(col("grp"), col("rn"))
      },
      Some("""WITH d AS (
        |  SELECT DISTINCT source AS grp,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT grp, h,
        |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |  FROM d),
        |reg AS (SELECT grp, CAST(rn AS INT) AS rn, h FROM r WHERE rn <= 16),
        |e AS (SELECT grp, count(*) AS n_regs, max(h) AS h_k
        |      FROM reg GROUP BY 1)
        |SELECT reg.grp, rn, h, n_regs,
        |  CASE WHEN n_regs < 16 THEN CAST(n_regs AS DOUBLE)
        |       ELSE 15.0 * 1152921504606846976.0 / h_k END AS est
        |FROM reg JOIN e ON reg.grp = e.grp
        |ORDER BY reg.grp, rn""".stripMargin)),

    // Cross-source similarity FROM SKETCHES: pairwise Jaccard of the
    // per-source KMV register tables (k smallest union hashes, count
    // in-both) — the register-value capability that justifies KMV
    // next to HLL. The oracle replays the same construction from the
    // raw table; all-integer readout (matched, kk, ppm).
    "q251_kmv_jaccard" -> Q(
      (s, dir) => Sketch.kmvPairwiseJaccard(
          Sketch.kmvBy(Tables.documents(s, dir), col("source"),
            col("text"), k = 16), k = 16)
        .orderBy(col("grp_a"), col("grp_b")),
      Some("""WITH d AS (
        |  SELECT DISTINCT source AS grp,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT grp, h,
        |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |  FROM d),
        |reg AS (SELECT grp, h FROM r WHERE rn <= 16),
        |g AS (SELECT DISTINCT grp FROM reg),
        |p AS (SELECT a.grp AS grp_a, b.grp AS grp_b
        |      FROM g a JOIN g b ON a.grp < b.grp),
        |t AS (
        |  SELECT grp_a, grp_b, h,
        |    max(CASE WHEN g2.grp = grp_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN g2.grp = grp_b THEN 1 ELSE 0 END) AS in_b
        |  FROM p JOIN reg g2 ON g2.grp = grp_a OR g2.grp = grp_b
        |  GROUP BY 1, 2, 3),
        |u AS (
        |  SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b
        |    ORDER BY h) AS rn
        |  FROM t)
        |SELECT grp_a, grp_b, count(*) AS kk,
        |  CAST(sum(in_a * in_b) AS BIGINT) AS matched,
        |  (1000000 * CAST(sum(in_a * in_b) AS BIGINT)) // count(*)
        |    AS jacc_ppm
        |FROM u WHERE rn <= 16
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)),

    // EXACT bitmap index (63 sign-safe bits/word on the doc_id row
    // space): predicate bitmaps for lang='en' and n_chars>500 with
    // word-wise AND/OR — boolean predicate algebra that never
    // re-touches the table. The full word table gates bit-for-bit.
    "q276_bitmap_index" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Sketch.bitmapCombine(
            Sketch.bitmapBuild(docs, "doc_id", col("lang") === "en"),
            Sketch.bitmapBuild(docs, "doc_id", col("n_chars") > 500))
          .orderBy(col("word_idx"))
      },
      Some("""WITH a AS (
        |  SELECT doc_id // 63 AS word_idx,
        |    CAST(sum(1::BIGINT << CAST(doc_id % 63 AS INT))
        |      AS BIGINT) AS bits_a
        |  FROM documents WHERE lang = 'en' GROUP BY 1),
        |b AS (
        |  SELECT doc_id // 63 AS word_idx,
        |    CAST(sum(1::BIGINT << CAST(doc_id % 63 AS INT))
        |      AS BIGINT) AS bits_b
        |  FROM documents WHERE n_chars > 500 GROUP BY 1)
        |SELECT coalesce(a.word_idx, b.word_idx) AS word_idx,
        |  coalesce(bits_a, 0) AS bits_a,
        |  coalesce(bits_b, 0) AS bits_b,
        |  coalesce(bits_a, 0) & coalesce(bits_b, 0) AS bits_and,
        |  coalesce(bits_a, 0) | coalesce(bits_b, 0) AS bits_or
        |FROM a FULL OUTER JOIN b ON a.word_idx = b.word_idx
        |ORDER BY word_idx""".stripMargin)),

    // EXACT heavy hitters with bounded memory: Misra-Gries candidate
    // pass (k counters per task, partition-dependent superset) + an
    // exact re-count of the broadcast candidates. The oracle runs the
    // definitional full GROUP BY ... HAVING — agreement proves the
    // two-pass bounded-state plan computes the TRUE >n/k set, which
    // is the point: no full-cardinality groupBy at 100 TB. Same token
    // stream as q106 (CMS flavor); different guarantee (no false
    // positives at all).
    "q287_mg_heavy_hitters" -> Q(
      (s, dir) => Sketch.mgHeavyHitters(
          Tables.documents(s, dir)
            .select(explode(graft.operators.TextAnalysis.tokens(
              lower(col("text")))).as("t")),
          col("t"), k = 200)
        .orderBy(col("key")),
      Some("""WITH tok AS (
        |  SELECT unnest(CASE WHEN trim(lower(text)) = ''
        |                THEN CAST([] AS VARCHAR[])
        |                ELSE string_split_regex(trim(lower(text)),
        |                  '\s+') END) AS t
        |  FROM documents)
        |SELECT t AS key, count(*) AS cnt
        |FROM tok
        |GROUP BY t
        |HAVING count(*) * 200 > (SELECT count(*) FROM tok)
        |ORDER BY key""".stripMargin)),

    // Deterministic Poisson-bootstrap CI for mean document length:
    // 32 resamples = 64 paired aggregates in ONE scan (no ×32
    // explode); weights are md5-nibble draws both engines replay
    // identically. CI bounds are nearest-rank order statistics of
    // the replicate means (selected integers); sum_means_milli pins
    // all 32 resamples, not just the two picked ranks.
    "q288_bootstrap_ci" -> Q(
      (s, dir) => graft.operators.Corpus.bootstrapMeanCI(
        Tables.documents(s, dir), "doc_id", "n_chars",
        replicates = 32, salt = "bs1", loPct = 5, hiPct = 95),
      Some("""WITH g AS (SELECT unnest(generate_series(0, 31)) AS r),
        |w AS (
        |  SELECT g.r, d.n_chars,
        |    CASE WHEN nib < 6 THEN 0 WHEN nib < 12 THEN 1
        |         WHEN nib < 15 THEN 2 ELSE 3 END AS w
        |  FROM documents d CROSS JOIN g,
        |    LATERAL (SELECT CAST('0x' ||
        |      substr(md5(d.doc_id || '#' || g.r || '#bs1'), 1, 1)
        |      AS BIGINT) AS nib)),
        |m AS (
        |  SELECT r, CAST(sum(w * n_chars) * 1000 //
        |    greatest(sum(w), 1) AS BIGINT) AS mean_milli
        |  FROM w GROUP BY r),
        |s AS (SELECT mean_milli,
        |        row_number() OVER (ORDER BY mean_milli) AS rk
        |      FROM m),
        |base AS (SELECT count(*) AS n, sum(n_chars) AS sx
        |         FROM documents)
        |SELECT n,
        |  CAST(sx * 1000 // greatest(n, 1) AS BIGINT) AS point_milli,
        |  (SELECT mean_milli FROM s WHERE rk = 2) AS ci_lo_milli,
        |  (SELECT mean_milli FROM s WHERE rk = 31) AS ci_hi_milli,
        |  CAST(32 AS BIGINT) AS n_replicates,
        |  (SELECT CAST(sum(mean_milli) AS BIGINT) FROM s)
        |    AS sum_means_milli
        |FROM base""".stripMargin)),

    // Join-size estimation from KMV sketches — optimizer statistics
    // without running the join: Ĵ·Û(A∪B) estimated common keys × the
    // uniform-multiplicity factors, from bytes-sized sketches. The
    // oracle replays the register tables AND the pinned
    // left-to-right float chain; the TRUE size (Σ cntA·cntB, exact
    // integer) sits beside the estimate so the estimator's bias is
    // measured, not hidden.
    "q298_join_size_est" -> Q(
      (s, dir) => {
        val a = Tables.events(s, dir).filter(col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("k"))
        val b = Tables.orders(s, dir)
          .select(col("o_custkey").cast("string").as("k"))
        val est = Sketch.joinSizeEstimate(a, col("k"), b, col("k"), 64)
        val truth = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
          .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), "k")
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
            .as("true_rows"))
        est.crossJoin(broadcast(truth))
      },
      Some("""WITH ka AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(
        |    CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |kb AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(
        |    CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM orders),
        |ra AS (SELECT h FROM (SELECT h,
        |    row_number() OVER (ORDER BY h) AS rn FROM ka)
        |  WHERE rn <= 64),
        |rb AS (SELECT h FROM (SELECT h,
        |    row_number() OVER (ORDER BY h) AS rn FROM kb)
        |  WHERE rn <= 64),
        |ea AS (SELECT count(*) AS n_regs, max(h) AS h_k FROM ra),
        |eb AS (SELECT count(*) AS n_regs, max(h) AS h_k FROM rb),
        |mu AS (SELECT h FROM (
        |    SELECT h, row_number() OVER (ORDER BY h) AS rn
        |    FROM (SELECT DISTINCT h FROM
        |      (SELECT h FROM ra UNION ALL SELECT h FROM rb)))
        |  WHERE rn <= 64),
        |eu AS (SELECT count(*) AS n_regs, max(h) AS h_k FROM mu),
        |tag AS (
        |  SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |    SELECT h, 1 AS in_a, 0 AS in_b FROM ra
        |    UNION ALL SELECT h, 0, 1 FROM rb)
        |  GROUP BY h),
        |jw AS (SELECT in_a, in_b FROM (
        |    SELECT in_a, in_b, row_number() OVER (ORDER BY h) AS rn
        |    FROM tag)
        |  WHERE rn <= 64),
        |jac AS (SELECT CAST(count(*) AS BIGINT) AS kk,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS matched
        |  FROM jw),
        |na AS (SELECT count(*) AS rows_a FROM events
        |       WHERE user_id IS NOT NULL),
        |nb AS (SELECT count(*) AS rows_b FROM orders),
        |tru AS (
        |  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT)
        |    AS true_rows
        |  FROM (SELECT user_id AS k, count(*) AS ca FROM events
        |        WHERE user_id IS NOT NULL GROUP BY 1) a
        |  JOIN (SELECT o_custkey AS k, count(*) AS cb FROM orders
        |        GROUP BY 1) b ON a.k = b.k),
        |est AS (
        |  SELECT
        |    CASE WHEN ea.n_regs < 64 THEN CAST(ea.n_regs AS DOUBLE)
        |         ELSE 63.0 * 1152921504606846976.0 / ea.h_k END AS u_a,
        |    CASE WHEN eb.n_regs < 64 THEN CAST(eb.n_regs AS DOUBLE)
        |         ELSE 63.0 * 1152921504606846976.0 / eb.h_k END AS u_b,
        |    CASE WHEN eu.n_regs < 64 THEN CAST(eu.n_regs AS DOUBLE)
        |         ELSE 63.0 * 1152921504606846976.0 / eu.h_k END
        |      AS u_union
        |  FROM ea, eb, eu)
        |SELECT jac.kk, jac.matched,
        |  (1000000 * jac.matched) // jac.kk AS jacc_ppm,
        |  est.u_a, est.u_b, est.u_union,
        |  na.rows_a, nb.rows_b,
        |  ((CAST(jac.matched AS DOUBLE) / CAST(jac.kk AS DOUBLE)) *
        |    est.u_union) *
        |    ((CAST(na.rows_a AS DOUBLE) / est.u_a) *
        |     (CAST(nb.rows_b AS DOUBLE) / est.u_b)) AS est_rows,
        |  tru.true_rows
        |FROM jac, est, na, nb, tru""".stripMargin)),

    // Exact phrase search over a positional index: "fast hash"
    // matched by the adjacency chain (token i at start+i), per-doc
    // phrase tf, tf-desc/doc-asc top-20. Overlapping matches count —
    // standard positional-index semantics, oracle-exact integers.
    "q373_phrase_search" -> Q(
      (s, dir) => Search.phraseSearch(
        Search.positionalPostings(
          Tables.documents(s, dir), "doc_id", "text"),
        Seq("fast", "hash"), 20),
      Some(s"""WITH $toksCte,
        |p AS (SELECT doc_id,
        |    CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
        |    unnest(toks) AS token FROM t),
        |m AS (SELECT a.doc_id, a.pos
        |  FROM p a JOIN p b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.token = 'fast' AND b.token = 'hash')
        |SELECT doc_id, count(*) AS phrase_tf FROM m GROUP BY 1
        |ORDER BY phrase_tf DESC, doc_id LIMIT 20""".stripMargin)),

    // Posting-list delta+varint compression accounting: per token,
    // raw 8-byte doc ids vs LEB128-varint gap encoding — frequent
    // terms have dense lists and small gaps, so savings track df.
    // Exact integer byte math, lag-window gaps mirrored in SQL.
    "q387_posting_compression" -> Q(
      (s, dir) => Search.postingCompression(
          Search.termFrequencies(
            Tables.documents(s, dir), "doc_id", "text"))
        .orderBy(col("token")),
      Some(s"""WITH $tfCte,
        |g AS (SELECT token, doc_id,
        |    doc_id - coalesce(lag(doc_id) OVER (
        |      PARTITION BY token ORDER BY doc_id), 0) AS gap
        |  FROM tf),
        |b AS (SELECT token, count(*) AS df,
        |    CAST(sum(CASE WHEN gap < 128 THEN 1
        |      WHEN gap < 16384 THEN 2
        |      WHEN gap < 2097152 THEN 3
        |      WHEN gap < 268435456 THEN 4
        |      WHEN gap < 34359738368 THEN 5
        |      WHEN gap < 4398046511104 THEN 6
        |      WHEN gap < 562949953421312 THEN 7
        |      WHEN gap < 72057594037927936 THEN 8
        |      ELSE 9 END) AS BIGINT) AS varint_bytes
        |  FROM g GROUP BY 1)
        |SELECT token, df, df * 8 AS raw_bytes, varint_bytes,
        |  (df * 8 - varint_bytes) * 1000000 // (df * 8) AS savings_ppm
        |FROM b ORDER BY token""".stripMargin)),

    // Proximity ranking: docs containing both query terms rank by
    // the MINIMAL gap between an occurrence of each — the classic
    // lexical-proximity feature between bag-of-words and phrase
    // match. One doc-keyed lag window over the term-filtered
    // positional slice (adjacent different-type pairs suffice: the
    // minimal mixed gap is always adjacent in sorted position order).
    "q420_proximity_rank" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val p = Search.positionalPostings(
            Tables.documents(s, dir), "doc_id", "text")
          .filter(col("token").isin("fast", "table"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val gaps = p
          .withColumn("ptok", lag(col("token"), 1).over(w))
          .withColumn("ppos", lag(col("pos"), 1).over(w))
          .filter(col("ptok").isNotNull && col("ptok") =!= col("token"))
          .groupBy(col("doc_id"))
          .agg(min(col("pos") - col("ppos")).as("min_gap"))
        gaps.orderBy(col("min_gap"), col("doc_id")).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("min_gap"), col("doc_id"))).cast("long"))
      },
      Some(s"""WITH $toksCte,
        |p AS (SELECT doc_id,
        |    CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
        |    unnest(toks) AS token FROM t),
        |f AS (SELECT doc_id, pos, token,
        |    lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS ptok,
        |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS ppos
        |  FROM p WHERE token IN ('fast', 'table')),
        |g AS (SELECT doc_id, min(pos - ppos) AS min_gap
        |  FROM f WHERE ptok IS NOT NULL AND ptok <> token
        |  GROUP BY 1)
        |SELECT doc_id, min_gap, row_number() OVER (
        |    ORDER BY min_gap, doc_id) AS rank
        |FROM g ORDER BY min_gap, doc_id LIMIT 20""".stripMargin)),

    // Best-snippet selection: the 8-token span covering the most
    // distinct query terms (ties to the earliest start), anchored at
    // term hits — the highlighting anchor of a result page. Distinct
    // coverage via collect_set over a pos-range window (integers, no
    // approximation), mirrored by count(DISTINCT) in the oracle.
    "q374_best_snippet" -> Q(
      (s, dir) => Search.bestSnippet(
          Search.positionalPostings(
            Tables.documents(s, dir), "doc_id", "text"),
          Seq("spark", "join", "merge"), window = 8)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
        |p AS (SELECT doc_id,
        |    CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
        |    unnest(toks) AS token FROM t),
        |h AS (SELECT doc_id, pos, token FROM p
        |  WHERE token IN ('spark', 'join', 'merge')),
        |cov AS (SELECT a.doc_id, a.pos,
        |    CAST(count(DISTINCT b.token) AS BIGINT) AS n_terms
        |  FROM h a JOIN h b ON a.doc_id = b.doc_id
        |    AND b.pos BETWEEN a.pos AND a.pos + 7
        |  GROUP BY a.doc_id, a.pos)
        |SELECT doc_id, pos AS snip_pos, n_terms FROM (
        |  SELECT doc_id, pos, n_terms, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY n_terms DESC, pos) AS rn
        |  FROM cov)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // BM25 in exact integer ppm (VERDICT r7 item 3) — the last
    // float-only retrieval operator brought under the hash gate. The
    // idf log runs through FixedPoint.lnPpm's shift-and-square i64
    // kernel; the oracle replays the IDENTICAL algorithm as a
    // recursive CTE (FixedPoint.lnPpmSqlCtes), so the full ranking —
    // scores included — hash-matches, not just its order.
    "q424_bm25_ppm" -> Q(
      (s, dir) => Search.bm25Ppm(
          Search.termFrequencies(
            Tables.documents(s, dir), "doc_id", "text"),
          Seq("fast", "table", "hash"), 25)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_ppm").desc, col("doc_id"))).cast("long")),
      Some(s"""WITH RECURSIVE $tfCte,
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        |  FROM tf GROUP BY 1),
        |corpus AS (SELECT count(*) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS len_total FROM dl),
        |m AS (SELECT token, doc_id, tf FROM tf
        |  WHERE token IN ('fast', 'table', 'hash')),
        |dfreq AS (SELECT token, count(*) AS df FROM m GROUP BY 1),
        |src AS (SELECT token AS key, n_docs * 2 + 2 AS num,
        |    df * 2 + 1 AS den FROM dfreq, corpus),
        |${graft.functions.FixedPoint.lnPpmSqlCtes("src")},
        |scored AS (
        |  SELECT m.doc_id,
        |    CAST(sum((l.ln_ppm *
        |        ((22000000 * c.len_total * m.tf) //
        |         (c.len_total * m.tf * 10 + c.len_total * 3 +
        |          d.dl * c.n_docs * 9))) // 1000000) AS BIGINT)
        |      AS score_ppm
        |  FROM m JOIN lnppm l ON m.token = l.key
        |    JOIN dl d ON m.doc_id = d.doc_id, corpus c
        |  GROUP BY 1)
        |SELECT doc_id, score_ppm, row_number() OVER (
        |    ORDER BY score_ppm DESC, doc_id) AS rank
        |FROM scored ORDER BY score_ppm DESC, doc_id LIMIT 25""".stripMargin))
  )

  /** The winnowing selection as CTE stages ending in
    * `sel(doc_id, wmin)` — shared by q127 and q129 so both replay the
    * identical shingle/hash/window construction (k=3, w=4).
    */
  private val winnowSelCte =
    """toks AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, i - 1 AS pos,
      |         array_to_string(t[i:i+2], ' ') AS gram
      |  FROM (SELECT doc_id, t,
      |          unnest(generate_series(1, len(t) - 2)) AS i
      |        FROM toks WHERE len(t) >= 3)
      |  UNION ALL
      |  SELECT doc_id, 0 AS pos, array_to_string(t, ' ') AS gram
      |  FROM toks WHERE len(t) < 3),
      |h AS (SELECT doc_id, pos,
      |        CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
      |      FROM sh),
      |keyed AS (
      |  SELECT doc_id, pos,
      |    lpad(to_hex(h), 15, '0') ||
      |      lpad(CAST(pos AS VARCHAR), 10, '0') AS key,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM h),
      |wm AS (
      |  SELECT doc_id, pos, n,
      |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      |  FROM keyed),
      |sel AS (SELECT DISTINCT doc_id, wmin
      |        FROM wm WHERE pos <= greatest(0, n - 4))""".stripMargin
}
