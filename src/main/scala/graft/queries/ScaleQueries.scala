package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup, LanguageModel}

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
        |ORDER BY a, b""".stripMargin)),

    // CCNet-style LM quality bucketing: score every doc with the
    // q135 interpolated trigram LM, cut the corpus into head/middle/
    // tail at the exact nearest-rank tertiles (quantilesBisect — the
    // O(log range) agg-pass path, no sort), label each doc. The SQL
    // mirrors the bisect's ceil(p·n)-th-smallest semantics with the
    // SAME double literals so the IEEE rank arithmetic matches.
    "q346_ccnet_buckets" -> Q(
      (s, dir) => {
        val lm = LanguageModel.trigramInterpolated(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text")
        // materialize BEFORE the bisect: quantilesBisect runs
        // O(log range) aggregate probes, and each would otherwise
        // recompute the whole trigram-LM pipeline (16.6 s → ~3 s)
        val scored = lm.filter(col("n_trigrams") > 0)
          .withColumn("avg_ppm", expr("interp_ppm_sum div n_trigrams"))
          .localCheckpoint(true)
        val th = Corpus.quantilesBisect(scored, "avg_ppm",
          Seq(1.0 / 3, 2.0 / 3))
        scored
          .crossJoin(broadcast(th.select(col("q_33"), col("q_67"))))
          .withColumn("bucket",
            when(col("avg_ppm") > col("q_67"), "head")
              .when(col("avg_ppm") > col("q_33"), "middle")
              .otherwise("tail"))
          .select(col("doc_id"), col("avg_ppm"), col("bucket"))
          .orderBy(col("doc_id"))
      },
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
        |    CAST(sum(cd * ppm) AS BIGINT) AS s_ppm
        |  FROM sc GROUP BY 1),
        |s2 AS (SELECT doc_id, s_ppm // n_trigrams AS avg_ppm
        |       FROM pd WHERE n_trigrams > 0),
        |nn AS (SELECT count(*) AS n FROM s2),
        |rk AS (SELECT avg_ppm, row_number() OVER (ORDER BY avg_ppm) AS r
        |       FROM s2),
        |th AS (SELECT
        |    max(CASE WHEN r <= CAST(ceil(nn.n * (1.0/3)) AS BIGINT)
        |        THEN avg_ppm END) AS q33,
        |    max(CASE WHEN r <= CAST(ceil(nn.n * (2.0/3)) AS BIGINT)
        |        THEN avg_ppm END) AS q67
        |  FROM rk, nn)
        |SELECT doc_id, avg_ppm,
        |  CASE WHEN avg_ppm > q67 THEN 'head'
        |       WHEN avg_ppm > q33 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM s2, th ORDER BY doc_id""".stripMargin)),

    // Trained char-trigram language ID: profiles from the labeled
    // EVEN half, classification of the ODD half, confusion matrix
    // out. Both engines replay the identical top-100 rank (count
    // desc, gram asc) and argmax (score desc, label asc) tie-breaks.
    "q347_langid_confusion" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val prof = LanguageModel.charTrigramProfiles(
          docs.filter(col("doc_id") % 2 === 0), "lang", "text",
          topM = 100)
        val preds = LanguageModel.classifyByProfiles(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", prof)
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"))
          .join(preds, Seq("doc_id"), "left")
          .withColumn("pred", coalesce(col("pred"), lit("none")))
          .groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, lang, lower(coalesce(text, '')) AS s
        |  FROM documents),
        |g AS (SELECT doc_id, lang, substr(s, CAST(i AS INT), 3) AS gram
        |      FROM (SELECT doc_id, lang, s,
        |              unnest(generate_series(1, length(s) - 2)) AS i
        |            FROM d WHERE length(s) >= 3)),
        |tr AS (SELECT lang, gram, count(*) AS cnt FROM g
        |       WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |prof AS (SELECT lang AS cand, gram FROM (
        |    SELECT lang, gram, row_number() OVER (
        |      PARTITION BY lang ORDER BY cnt DESC, gram) AS rk
        |    FROM tr) WHERE rk <= 100),
        |tg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 2 = 1),
        |sc AS (SELECT tg.doc_id, prof.cand, count(*) AS score
        |       FROM tg JOIN prof USING (gram) GROUP BY 1, 2),
        |pr AS (SELECT doc_id, cand AS pred FROM (
        |    SELECT doc_id, cand, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY score DESC, cand) AS rk
        |    FROM sc) WHERE rk = 1)
        |SELECT d.lang AS lang, coalesce(pr.pred, 'none') AS pred,
        |  count(*) AS n
        |FROM d LEFT JOIN pr USING (doc_id)
        |WHERE d.doc_id % 2 = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Cross-document duplicated-span removal (the Lee et al. apply
    // half; q133 is the detection half): 5-gram anchors shared by ≥2
    // docs are kept only by their min-id owner; every non-owner
    // drops the union of covered positions and reassembles. The
    // corpus's planted exact dups make the removal population real —
    // full copies dedup down to n_kept 0.
    "q348_remove_dup_spans" -> Q(
      (s, dir) => Dedup.removeDupSpans(
          Tables.documents(s, dir), "doc_id", "text", spanTokens = 5)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS t
        |  FROM documents),
        |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
        |tk AS (SELECT doc_id, i - 1 AS tpos, t[i] AS tok
        |       FROM (SELECT doc_id, t,
        |               unnest(generate_series(1, len(t))) AS i
        |             FROM toks WHERE len(t) >= 1)),
        |sh AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))
        |      AS BIGINT) AS h
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 4)) AS i
        |        FROM toks WHERE len(t) >= 5)),
        |ow AS (SELECT h, min(doc_id) AS keep, count(DISTINCT doc_id) AS nd
        |       FROM sh GROUP BY 1),
        |fr AS (SELECT sh.doc_id, sh.pos FROM sh JOIN ow USING (h)
        |       WHERE ow.nd >= 2 AND sh.doc_id <> ow.keep),
        |cov AS (SELECT DISTINCT doc_id, tpos FROM (
        |    SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS tpos
        |    FROM fr)),
        |kept AS (SELECT tk.doc_id, tk.tpos, tk.tok
        |  FROM tk LEFT JOIN cov
        |    ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos
        |  WHERE cov.tpos IS NULL),
        |re AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY tpos) AS text_dedup
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id, d.n_tokens,
        |  coalesce(re.n_kept, 0) AS n_kept,
        |  d.n_tokens - coalesce(re.n_kept, 0) AS n_dropped,
        |  coalesce(re.text_dedup, '') AS text_dedup
        |FROM d LEFT JOIN re USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // Rabin–Karp rolling fingerprints: the native expression computes
    // every 16-char window hash in ONE O(n) roll; the oracle
    // recomputes each window from the DEFINITION (O(n·k) list_reduce
    // per window). min-hash, 1/64 mod-sampled count, and the sampled
    // xor must match on every document — one wrong window anywhere
    // breaks the xor.
    "q349_rolling_fingerprints" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"),
          coalesce(col("text"), lit("")).as("s"))
        val agg = d.select(col("doc_id"),
            explode(graft.expressions.RollingHash.rollingNative(
              col("s"), 16)).as("h"))
          .groupBy(col("doc_id")).agg(
            count(lit(1)).as("n_windows"),
            min(col("h")).as("min_hash"),
            sum(when(col("h") % 64 === 0, 1L).otherwise(0L)).as("n_fp"),
            coalesce(expr("bit_xor(CASE WHEN h % 64 = 0 THEN h END)"),
              lit(0L)).as("fp_xor"))
        d.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_windows"), lit(0L)).as("n_windows"),
            coalesce(col("min_hash"), lit(0L)).as("min_hash"),
            coalesce(col("n_fp"), lit(0L)).as("n_fp"),
            coalesce(col("fp_xor"), lit(0L)).as("fp_xor"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS s FROM documents),
        |w AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 16),
        |        j -> CAST(ord(substr(s, CAST(i + j - 1 AS INT), 1))
        |               AS BIGINT))),
        |      (a, b) -> (a * 131 + b) % 1000000007) AS h
        |  FROM (SELECT doc_id, s,
        |          unnest(generate_series(1, length(s) - 15)) AS i
        |        FROM d WHERE length(s) >= 16)),
        |a AS (SELECT doc_id, count(*) AS n_windows, min(h) AS min_hash,
        |    CAST(sum(CASE WHEN h % 64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_fp,
        |    coalesce(bit_xor(CASE WHEN h % 64 = 0 THEN h END), 0)
        |      AS fp_xor
        |  FROM w GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_windows, 0) AS n_windows,
        |  coalesce(a.min_hash, 0) AS min_hash,
        |  coalesce(a.n_fp, 0) AS n_fp, coalesce(a.fp_xor, 0) AS fp_xor
        |FROM d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    // Content-defined chunking over the rolling hash: cuts where
    // h ≡ 0 mod 64, chunk bytes fingerprinted, corpus-wide first
    // occurrence flagged — the planted dup docs produce identical
    // chunk sequences whose copies all flag is_first = false.
    "q350_cdc_chunks" -> Q(
      (s, dir) => Dedup.contentDefinedChunks(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS s FROM documents),
        |w AS (SELECT doc_id, i,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 16),
        |        j -> CAST(ord(substr(s, CAST(i + j - 1 AS INT), 1))
        |               AS BIGINT))),
        |      (a, b) -> (a * 131 + b) % 1000000007) AS h
        |  FROM (SELECT doc_id, s,
        |          unnest(generate_series(1, length(s) - 15)) AS i
        |        FROM d WHERE length(s) >= 16)),
        |c AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS off FROM w
        |      WHERE h % 64 = 0 AND i - 1 > 0),
        |b AS (SELECT DISTINCT doc_id, off FROM (
        |    SELECT doc_id, CAST(0 AS BIGINT) AS off FROM d
        |    UNION ALL SELECT doc_id, off FROM c)),
        |ch AS (SELECT b.doc_id,
        |    row_number() OVER (PARTITION BY b.doc_id ORDER BY b.off) - 1
        |      AS chunk_idx,
        |    b.off,
        |    coalesce(lead(b.off) OVER (PARTITION BY b.doc_id
        |        ORDER BY b.off), length(d.s)) - b.off AS len,
        |    d.s
        |  FROM b JOIN d USING (doc_id)),
        |ch2 AS (SELECT doc_id, chunk_idx, off, len,
        |    md5(substr(s, CAST(off + 1 AS INT), CAST(len AS INT)))
        |      AS chunk_md5
        |  FROM ch WHERE len > 0)
        |SELECT doc_id, chunk_idx, off, len, chunk_md5,
        |  row_number() OVER (PARTITION BY chunk_md5
        |    ORDER BY doc_id, chunk_idx) = 1 AS is_first
        |FROM ch2 ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Deterministic epoch shuffle: two seeds, two independent orders,
    // both ranked through the bucketed no-global-sort path; the
    // oracle IS the global sort (row_number over the hash), so the
    // order-aligned bucket decomposition is proven exact for both
    // epochs, plus the epoch-0 shard layout.
    "q355_epoch_shuffle" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"))
        val e0 = Corpus.epochShuffle(d, "doc_id", "e0", shardSize = 64L)
          .select(col("doc_id"), col("epoch_pos").as("pos0"),
            col("shard_id").as("shard0"))
        val e1 = Corpus.epochShuffle(d, "doc_id", "e1", shardSize = 64L)
          .select(col("doc_id"), col("epoch_pos").as("pos1"))
        e0.join(e1, Seq("doc_id")).orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        |  row_number() OVER (ORDER BY md5('e0:' || doc_id), doc_id) - 1
        |    AS pos0,
        |  (row_number() OVER (ORDER BY md5('e0:' || doc_id), doc_id)
        |    - 1) // 64 AS shard0,
        |  row_number() OVER (ORDER BY md5('e1:' || doc_id), doc_id) - 1
        |    AS pos1
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Shard manifests with content checksums: per q355 shard, member
    // count, byte total, and a manifest digest — md5 over the
    // position-ordered member fingerprints — the integrity artifact
    // that ships WITH a shard so a trainer can verify what it read.
    // Position-ordered aggregation keeps the digest deterministic.
    "q416_shard_manifest" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"),
            md5(coalesce(col("text"), lit(""))).as("fp"))
        Corpus.epochShuffle(d, "doc_id", "e0", shardSize = 64L)
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            md5(array_join(transform(array_sort(collect_list(
              struct(col("epoch_pos"), col("fp").as("p")))),
              s2 => s2.getField("p")), "")).as("manifest_md5"))
          .orderBy(col("shard_id"))
      },
      Some("""WITH p AS (SELECT doc_id, n_chars,
        |    md5(coalesce(text, '')) AS fp,
        |    row_number() OVER (ORDER BY md5('e0:' || doc_id), doc_id)
        |      - 1 AS pos
        |  FROM documents)
        |SELECT pos // 64 AS shard_id, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  md5(string_agg(fp, '' ORDER BY pos)) AS manifest_md5
        |FROM p GROUP BY 1 ORDER BY shard_id""".stripMargin)),

    // Distributed prefix sum → concatenated-shard byte offsets: each
    // doc's inclusive cumulative size, exclusive start offset, and
    // the 64 KiB-file assignment of its start — against the naive
    // single-partition running-sum oracle.
    "q363_shard_offsets" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"))
        Corpus.prefixSum(d, "doc_id", "n_chars", bucketWidth = 32L)
          .withColumn("start_off", col("cum") - col("n_chars"))
          .withColumn("file_id", expr("start_off div 65536"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id, n_chars,
        |  CAST(sum(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum
        |  FROM documents)
        |SELECT doc_id, n_chars, cum, cum - n_chars AS start_off,
        |  (cum - n_chars) // 65536 AS file_id
        |FROM c ORDER BY doc_id""".stripMargin)),

    // Cross-epoch shard-migration matrix: how many docs land in
    // (shard@e0, shard@e1) for two epoch shuffles — the diagnostic
    // that catches a broken shuffle (a diagonal-heavy matrix means
    // epochs are correlated and batch composition barely changes).
    // Both orders run through the bucketed rank path; the matrix is
    // one partial agg over their join.
    "q365_shard_migration" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"))
        val e0 = Corpus.epochShuffle(d, "doc_id", "e0", shardSize = 64L)
          .select(col("doc_id"), col("shard_id").as("shard0"))
        val e1 = Corpus.epochShuffle(d, "doc_id", "e1", shardSize = 64L)
          .select(col("doc_id"), col("shard_id").as("shard1"))
        e0.join(e1, Seq("doc_id"))
          .groupBy(col("shard0"), col("shard1"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("shard0"), col("shard1"))
      },
      Some("""WITH p AS (SELECT doc_id,
        |  (row_number() OVER (ORDER BY md5('e0:' || doc_id), doc_id)
        |    - 1) // 64 AS shard0,
        |  (row_number() OVER (ORDER BY md5('e1:' || doc_id), doc_id)
        |    - 1) // 64 AS shard1
        |  FROM documents)
        |SELECT shard0, shard1, count(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY shard0, shard1""".stripMargin)),

    // Mixed-language document detection — the curation stage q27/q347
    // feed: classify every SENTENCE with the trained trigram
    // profiles, then per doc the majority language, the off-majority
    // sentence share in ppm, and the mixed flag. Sentences too short
    // to carry a trigram classify as 'none' and count against the
    // majority (they ARE unattributable content). Profile broadcast,
    // sentence explode rides the scan, aggs doc-keyed.
    "q386_mixed_language" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val prof = LanguageModel.charTrigramProfiles(
          docs.filter(col("doc_id") % 2 === 0), "lang", "text",
          topM = 100)
        // the sentence split + per-sentence trigram classify below is
        // CPU-dense over a one-split local source — spread (guide §2.2)
        val punct = graft.operators.Spread.byKey(docs, "doc_id")
          .select(col("doc_id"),
            regexp_replace(coalesce(col("text"), lit("")),
              "((?:\\S+ ){4}\\S+) ", "$1. ").as("t"))
        val sents = graft.operators.TextAnalysis.sentences(
            punct, "doc_id", "t")
          .withColumn("sid", col("doc_id") * 1000 + col("sent_idx"))
        val preds = LanguageModel.classifyByProfiles(
          sents, "sid", "sentence", prof)
        val sp = sents.join(preds.select(col("sid"), col("pred")),
            Seq("sid"), "left")
          .withColumn("pred", coalesce(col("pred"), lit("none")))
        val cnt = sp.groupBy(col("doc_id"), col("pred"))
          .agg(count(lit(1)).as("c"))
        val major = cnt.withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("c").desc, col("pred"))))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("pred").as("major_lang"),
            col("c").as("n_major"))
        cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n_sents"))
          .join(major, "doc_id")
          .withColumn("n_off", col("n_sents") - col("n_major"))
          .withColumn("off_ppm", expr("n_off * 1000000L div n_sents"))
          .withColumn("mixed", col("off_ppm") >= 200000)
          .select(col("doc_id"), col("n_sents"), col("major_lang"),
            col("n_off"), col("off_ppm"), col("mixed"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
        |  SELECT doc_id, lang, lower(coalesce(text, '')) AS s
        |  FROM documents),
        |g AS (SELECT doc_id, lang, substr(s, CAST(i AS INT), 3) AS gram
        |      FROM (SELECT doc_id, lang, s,
        |              unnest(generate_series(1, length(s) - 2)) AS i
        |            FROM d WHERE length(s) >= 3)),
        |tr AS (SELECT lang, gram, count(*) AS cnt FROM g
        |       WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |prof AS (SELECT lang AS cand, gram FROM (
        |    SELECT lang, gram, row_number() OVER (
        |      PARTITION BY lang ORDER BY cnt DESC, gram) AS rk
        |    FROM tr) WHERE rk <= 100),
        |pt AS (SELECT doc_id, regexp_replace(coalesce(text, ''),
        |    '((?:\S+ ){4}\S+) ', '\1. ', 'g') AS t FROM documents),
        |m AS (SELECT doc_id, generate_subscripts(l, 1) - 1 AS sent_idx,
        |    unnest(l) AS raw
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(t, '[^.!?]+[.!?]?') AS l
        |        FROM pt)),
        |sn AS (SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx,
        |    trim(regexp_replace(raw, '\s+', ' ', 'g')) AS sentence
        |  FROM m),
        |se AS (SELECT doc_id, doc_id * 1000 + sent_idx AS sid,
        |    lower(sentence) AS ss
        |  FROM sn WHERE length(sentence) > 0),
        |sg AS (SELECT DISTINCT sid, substr(ss, CAST(i AS INT), 3) AS gram
        |  FROM (SELECT sid, ss,
        |          unnest(generate_series(1, length(ss) - 2)) AS i
        |        FROM se WHERE length(ss) >= 3)),
        |sc AS (SELECT sg.sid, prof.cand, count(*) AS score
        |  FROM sg JOIN prof USING (gram) GROUP BY 1, 2),
        |pr AS (SELECT sid, cand AS pred FROM (
        |    SELECT sid, cand, row_number() OVER (
        |      PARTITION BY sid ORDER BY score DESC, cand) AS rk
        |    FROM sc) WHERE rk = 1),
        |sp AS (SELECT se.doc_id, coalesce(pr.pred, 'none') AS pred
        |  FROM se LEFT JOIN pr USING (sid)),
        |c AS (SELECT doc_id, pred, count(*) AS c FROM sp GROUP BY 1, 2),
        |mj AS (SELECT doc_id, pred AS major_lang, c AS n_major FROM (
        |    SELECT doc_id, pred, c, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY c DESC, pred) AS rk
        |    FROM c) WHERE rk = 1),
        |t AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_sents
        |  FROM c GROUP BY 1)
        |SELECT t.doc_id, t.n_sents, mj.major_lang,
        |  t.n_sents - mj.n_major AS n_off,
        |  (t.n_sents - mj.n_major) * 1000000 // t.n_sents AS off_ppm,
        |  (t.n_sents - mj.n_major) * 1000000 // t.n_sents >= 200000
        |    AS mixed
        |FROM t JOIN mj USING (doc_id) ORDER BY doc_id""".stripMargin))
  )
}
