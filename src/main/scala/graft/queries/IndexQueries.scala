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
  private[queries] val toksCte =
    """t AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents)""".stripMargin

  /** token-frequency CTE (token, doc_id, tf) shared by the index and
    * search oracles.
    */
  private[queries] val tfCte =
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
  private[queries] def bpeStage(n: Int): String = {
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
  private[queries] val bpeHeadCte =
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

    // BPE-DROPOUT subword regularization (Provilkov 2020): the
    // 3-round trained merge chain re-applied with per-(word, merge)
    // salted-hash drops (p = 0.3), two salts — the BPE-family
    // companion to q466's unigram sampling, closing subword
    // regularization across both trained tokenizer families. The
    // oracle replays training AND both dropout chains (one CASE per
    // merge stage), so every sampled symbolization hash-gates.
    "q471_bpe_dropout" -> Q(
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(graft.operators.TextAnalysis.tokens(
            lower(col("text")))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val (words, merges) = Bpe.train(vocab, "word", "cnt", rounds = 3)
        val base = words.select(col("word"),
          size(split(trim(col("sym")), "\\s+")).cast("long")
            .as("n_sub_best"))
        Seq("sA", "sB").map { salt =>
            Bpe.dropoutSymbolize(vocab, "word",
                merges.map(m => (m._1, m._2)), salt, dropPpm = 300000L)
              .withColumn("salt", lit(salt))
          }.reduce(_ unionByName _)
          .join(base, Seq("word"))
          .select(col("word"), col("cnt"), col("salt"),
            trim(col("sym_drop")).as("sym_drop"),
            size(split(trim(col("sym_drop")), "\\s+")).cast("long")
              .as("n_sub_drop"),
            col("n_sub_best"))
          .orderBy(col("word"), col("salt"))
      },
      {
        def dropStage(saltTag: String, n: Int): String = {
          val prev = s"d$saltTag${n - 1}"
          // merge index in the hash is 0-based (Spark zipWithIndex)
          val h = s"CAST(('0x' || substr(md5(w.word || ':${n - 1}:" +
            s"$saltTag'), 1, 15)) AS BIGINT) % 1000000"
          s"""d$saltTag$n AS (
             |  SELECT w.word, w.cnt,
             |    CASE WHEN b.l IS NULL THEN w.sd
             |         WHEN $h < 300000 THEN w.sd
             |         ELSE replace(w.sd, ' ' || b.l || '  ' || b.r || ' ',
             |                      ' ' || b.l || b.r || ' ') END AS sd
             |  FROM $prev w LEFT JOIN b$n b ON TRUE)""".stripMargin
        }
        def dropChain(saltTag: String): String =
          s"""d${saltTag}0 AS (SELECT word, cnt, sym AS sd FROM w0),
             |${(1 to 3).map(dropStage(saltTag, _)).mkString(",\n")}"""
            .stripMargin
        Some(s"""WITH $bpeHeadCte,
          |${bpeStage(1)},
          |${bpeStage(2)},
          |${bpeStage(3)},
          |${dropChain("sA")},
          |${dropChain("sB")},
          |u AS (
          |  SELECT word, cnt, 'sA' AS salt, sd FROM dsA3
          |  UNION ALL
          |  SELECT word, cnt, 'sB' AS salt, sd FROM dsB3)
          |SELECT u.word, u.cnt, u.salt, trim(u.sd) AS sym_drop,
          |  CAST(len(string_split_regex(trim(u.sd), '\\s+')) AS BIGINT)
          |    AS n_sub_drop,
          |  CAST(len(string_split_regex(trim(w3.sym), '\\s+')) AS BIGINT)
          |    AS n_sub_best
          |FROM u JOIN w3 ON w3.word = u.word
          |ORDER BY u.word, u.salt""".stripMargin)
      }),

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
        |ORDER BY d.doc_id""".stripMargin))
  )

  /** The winnowing selection as CTE stages ending in
    * `sel(doc_id, wmin)` — shared by q127 and q129 so both replay the
    * identical shingle/hash/window construction (k=3, w=4).
    */
  private[queries] val winnowSelCte =
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
