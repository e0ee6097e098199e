package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Corpus, Dedup, Eval, Frontier, LanguageModel, QualityFilters, TextAnalysis}
import LlmQueries._

/** Second half of the LLM-pipeline pack (split from LlmQueries at the
  * sketch boundary for navigability — VERDICT r7 item 6; no behavior
  * change): frequency sketches, span corruption, quality-rule
  * batteries, the corpus pipeline, incremental dedup, and the
  * evaluation/statistics gates. Shared tokenizer/hash/CTE helpers
  * stay in [[LlmQueries]] (imported above) so the two files can never
  * drift on conventions.
  */
object LlmQueriesB extends QueryPack {

  override def defs: Map[String, Q] = Map(
    // Count-min sketch: the d×w counter table built as one bounded
    // partial agg (never vocab-sized state), then CMS point estimates
    // (min over rows) for the true top-20 tokens. Fixed-seed hash rows
    // are interpolated into the oracle, so the entire sketch AND every
    // estimate must match bit-for-bit — including collision inflation
    // at w=8, which the small vocab guarantees.
    "q93_count_min" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
        val sketch = graft.operators.Sketch.countMin(toks, col("t"), d = 4, w = 8)
        val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("t")).limit(20)
        graft.operators.Sketch.estimate(sketch, vocab, col("t"), d = 4, w = 8)
          .select(col("t").as("token"), col("true_cnt"), col("cms_est"))
          .orderBy(col("token"))
      },
      {
        val P = Dedup.P
        def rowsSql(src: String, extra: String) = Dedup.perms(4).zipWithIndex
          .map { case ((a, b), i) =>
            s"SELECT $extra$i AS i, ((h * $a + $b) % $P) % 8 AS bucket FROM $src"
          }.mkString("\n|    UNION ALL ")
        Some(s"""WITH tok AS (SELECT unnest($tokensSql) AS t FROM documents),
          |h AS (SELECT t, ${h60sql("t")} % $P AS h FROM tok),
          |ctr AS (
          |  SELECT i, bucket, count(*) AS cnt FROM (
          |    ${rowsSql("h", "")})
          |  GROUP BY i, bucket),
          |vocab AS (SELECT t, count(*) AS true_cnt FROM tok
          |  GROUP BY t ORDER BY true_cnt DESC, t LIMIT 20),
          |vh AS (SELECT t, true_cnt, ${h60sql("t")} % $P AS h FROM vocab),
          |pb AS (
          |    ${rowsSql("vh", "t, true_cnt, ")})
          |SELECT pb.t AS token, pb.true_cnt,
          |  min(coalesce(ctr.cnt, 0)) AS cms_est
          |FROM pb LEFT JOIN ctr ON pb.i = ctr.i AND pb.bucket = ctr.bucket
          |GROUP BY pb.t, pb.true_cnt
          |ORDER BY token""".stripMargin)
      }),

    // Count-Sketch (signed counters, median estimator) beside q93's
    // CMS: collisions cancel in expectation, so the estimate is
    // unbiased where CMS only upper-bounds. d=3 odd → the median IS a
    // counter value, exact integer; bucket rows reuse perms 0..2,
    // sign rows perms 3..5 (hash parity) — all interpolated into the
    // oracle verbatim.
    "q385_count_sketch" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
        val sketch = graft.operators.Sketch.countSketch(
          toks, col("t"), d = 3, w = 8)
        val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("t")).limit(20)
        graft.operators.Sketch.countSketchEstimate(
            sketch, vocab, col("t"), d = 3, w = 8)
          .select(col("t").as("token"), col("true_cnt"), col("cs_est"))
          .orderBy(col("token"))
      },
      {
        val P = Dedup.P
        val pr = Dedup.perms(6)
        def rowsSql(src: String, extra: String) = (0 until 3).map { j =>
          val (a, b) = pr(j)
          val (sa, sb) = pr(3 + j)
          s"""SELECT $extra$j AS i, ((h * $a + $b) % $P) % 8 AS bucket,
             |      CASE WHEN ((h * $sa + $sb) % $P) % 2 = 0
             |           THEN 1 ELSE -1 END AS sgn FROM $src""".stripMargin
        }.mkString("\n|    UNION ALL ")
        Some(s"""WITH tok AS (SELECT unnest($tokensSql) AS t FROM documents),
          |h AS (SELECT t, ${h60sql("t")} % $P AS h FROM tok),
          |ctr AS (
          |  SELECT i, bucket, CAST(sum(sgn) AS BIGINT) AS cnt FROM (
          |    ${rowsSql("h", "")})
          |  GROUP BY i, bucket),
          |vocab AS (SELECT t, count(*) AS true_cnt FROM tok
          |  GROUP BY t ORDER BY true_cnt DESC, t LIMIT 20),
          |vh AS (SELECT t, true_cnt, ${h60sql("t")} % $P AS h FROM vocab),
          |pb AS (
          |    ${rowsSql("vh", "t, true_cnt, ")})
          |SELECT pb.t AS token, pb.true_cnt,
          |  list_sort(list(pb.sgn * coalesce(ctr.cnt, 0)))[2] AS cs_est
          |FROM pb LEFT JOIN ctr ON pb.i = ctr.i AND pb.bucket = ctr.bucket
          |GROUP BY pb.t, pb.true_cnt
          |ORDER BY token""".stripMargin)
      }),

    // T5-style span corruption: hash-chosen 3-token spans (1-in-7
    // candidate rate, window-parallel overlap rule) masked into
    // <extra_id_k> sentinels, targets carrying the hidden tokens —
    // the denoising-objective pair, fully deterministic so the
    // oracle replays the noise exactly.
    "q389_span_corruption" -> Q(
      (s, dir) => Corpus.spanCorruption(
          Tables.documents(s, dir), "doc_id", "text",
          spanLen = 3, everyK = 7)
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
        |  FROM documents),
        |tk AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks))) AS i
        |        FROM t WHERE len(toks) >= 1)),
        |cd AS (SELECT doc_id, pos, tok,
        |    CASE WHEN ${h60sql("'sc:' || doc_id || ':' || pos")} % 7 = 0
        |      THEN 1 ELSE 0 END AS cand
        |  FROM tk),
        |sl AS (SELECT doc_id, pos, tok, cand,
        |    cand = 1 AND coalesce(max(cand) OVER (
        |      PARTITION BY doc_id ORDER BY pos
        |      RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING), 0) = 0 AS sel
        |  FROM cd),
        |st AS (SELECT doc_id, pos AS strt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS k
        |  FROM sl WHERE sel),
        |cv AS (SELECT doc_id, k, strt,
        |    unnest(generate_series(strt, strt + 2)) AS pos FROM st),
        |pc AS (SELECT s.doc_id, s.pos, s.tok, cv.k, cv.strt
        |  FROM sl s LEFT JOIN cv
        |    ON s.doc_id = cv.doc_id AND s.pos = cv.pos),
        |ag AS (SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_masked,
        |    CAST(count(DISTINCT k) AS BIGINT) AS n_spans,
        |    string_agg(CASE WHEN k IS NULL THEN tok
        |        WHEN pos = strt THEN '<extra_id_' || k || '>' END,
        |      ' ' ORDER BY pos) AS input_text,
        |    string_agg(CASE
        |        WHEN k IS NOT NULL AND pos = strt
        |          THEN '<extra_id_' || k || '> ' || tok
        |        WHEN k IS NOT NULL THEN tok END,
        |      ' ' ORDER BY pos) AS targets_text
        |  FROM pc GROUP BY 1)
        |SELECT doc_id, n_tokens, n_masked, n_spans,
        |  coalesce(input_text, '') AS input_text,
        |  coalesce(targets_text, '') AS targets_text,
        |  n_masked * 1000000 // n_tokens AS masked_ppm
        |FROM ag ORDER BY doc_id""".stripMargin)),

    // Source-mixture epoch planning: hash-derived target weights
    // apportion a 100k-char budget EXACTLY (largest remainder, the
    // q370 operator), then per source the implied epochs over
    // available chars in ppm and the oversampling flag — the "how
    // many passes of source X does this mixture imply" readout that
    // decides up-sampling risk before a run starts.
    "q393_mixture_plan" -> Q(
      (s, dir) => {
        val avail = Tables.documents(s, dir).groupBy(col("source"))
          .agg(sum(col("n_chars")).as("avail_chars"))
        val wts = avail.select(col("source"),
          (TextAnalysis.hash60(concat(lit("mix:"), col("source"))) % 5
            + 1).as("w"))
        Frontier.apportionBudget(wts, "source", "w", total = 100000L)
          .join(avail, "source")
          .withColumn("epochs_ppm",
            expr("budget * 1000000L div avail_chars"))
          .withColumn("oversampled", col("budget") > col("avail_chars"))
          .orderBy(col("source"))
      },
      Some(s"""WITH av AS (SELECT source,
        |    CAST(sum(n_chars) AS BIGINT) AS avail_chars
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source AS node, avail_chars,
        |    ${h60sql("'mix:' || source")} % 5 + 1 AS wgt FROM av),
        |s AS (SELECT CAST(sum(wgt) AS BIGINT) AS s FROM w),
        |b AS (SELECT node, avail_chars, wgt,
        |    (100000 * wgt) // s.s AS base,
        |    (100000 * wgt) % s.s AS rem FROM w, s),
        |l AS (SELECT 100000 - CAST(sum(base) AS BIGINT) AS lft FROM b),
        |r AS (SELECT node, avail_chars, wgt, base, rem,
        |    row_number() OVER (ORDER BY rem DESC, node) AS rk FROM b)
        |SELECT node AS source, CAST(wgt AS BIGINT) AS weight,
        |  CAST(base AS BIGINT) AS base,
        |  CAST(base + CASE WHEN rk <= l.lft THEN 1 ELSE 0 END
        |    AS BIGINT) AS budget,
        |  avail_chars,
        |  CAST(base + CASE WHEN rk <= l.lft THEN 1 ELSE 0 END
        |    AS BIGINT) * 1000000 // avail_chars AS epochs_ppm,
        |  CAST(base + CASE WHEN rk <= l.lft THEN 1 ELSE 0 END
        |    AS BIGINT) > avail_chars AS oversampled
        |FROM r, l ORDER BY source""".stripMargin)),

    // logfmt key=value ingestion over synthesized event lines: pairs
    // extract in line order (malformed spans never match — ingestion
    // can't throw), then per-key profile: occurrences, distinct
    // values, numeric share in ppm — the semi-structured step that
    // turns server/trainer logs into feature columns.
    "q403_logfmt_parse" -> Q(
      (s, dir) => {
        val lines = Tables.events(s, dir).select(col("event_id"),
          concat(lit("evt="), col("event_type"),
            lit(" user="), col("user_id").cast("string"),
            lit(" k="), (col("event_id") % 7).cast("string"),
            when(col("event_id") % 5 === 0, lit(" flag=true"))
              .otherwise(lit("")),
            lit(" v="), (col("event_id") % 100).cast("string"))
            .as("line"))
        TextAnalysis.logfmtPairs(lines, "event_id", "line")
          .groupBy(col("key"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("value")).as("n_vals"),
            sum(when(col("value").rlike("^[0-9]+$"), 1L)
              .otherwise(0L)).as("n_numeric"))
          .withColumn("numeric_ppm", expr("n_numeric * 1000000L div n"))
          .orderBy(col("key"))
      },
      Some("""WITH l AS (SELECT event_id,
        |    'evt=' || event_type || ' user=' || user_id ||
        |    ' k=' || (event_id % 7) ||
        |    CASE WHEN event_id % 5 = 0 THEN ' flag=true' ELSE '' END ||
        |    ' v=' || (event_id % 100) AS line
        |  FROM events),
        |p AS (SELECT event_id,
        |    unnest(regexp_extract_all(line, '([a-z_]+)=([^ ]+)')) AS e
        |  FROM l),
        |kv AS (SELECT event_id,
        |    regexp_extract(e, '([a-z_]+)=([^ ]+)', 1) AS key,
        |    regexp_extract(e, '([a-z_]+)=([^ ]+)', 2) AS value
        |  FROM p)
        |SELECT key, count(*) AS n,
        |  CAST(count(DISTINCT value) AS BIGINT) AS n_vals,
        |  CAST(sum(CASE WHEN regexp_matches(value, '^[0-9]+$')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
        |  CAST(sum(CASE WHEN regexp_matches(value, '^[0-9]+$')
        |    THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*)
        |    AS numeric_ppm
        |FROM kv GROUP BY 1 ORDER BY key""".stripMargin)),

    // n-gram novelty vs a reference corpus (the infini-gram-style
    // memorization/novelty readout): each odd doc scores the share of
    // its distinct 4-grams ABSENT from the even-doc reference set —
    // high novelty = genuinely new text, near-zero = recombination of
    // seen spans. Gram-keyed anti-join semantics via left join, all
    // integer ppm.
    "q402_ngram_novelty" -> Q(
      (s, dir) => {
        val g = Dedup.shingleHashes(
          Tables.documents(s, dir), "doc_id", "text", 4, dedup = true)
        val ref = g.filter(col("doc_id") % 2 === 0)
          .select(col("h")).distinct()
          .withColumn("__in_ref", lit(true))
        g.filter(col("doc_id") % 2 === 1)
          .join(ref, Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("__in_ref").isNull, 1L).otherwise(0L))
              .as("n_novel"))
          .withColumn("novelty_ppm",
            expr("n_novel * 1000000L div n_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
        |  SELECT doc_id, $normTokens AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) < 4
        |    THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 2),
        |      i -> array_to_string(t[i:i+3], ' '))
        |    END) AS s
        |  FROM toks),
        |h AS (SELECT DISTINCT doc_id,
        |    ${h60sql("s")} % ${Dedup.P} AS h FROM sh),
        |ref AS (SELECT DISTINCT h FROM h WHERE doc_id % 2 = 0),
        |t AS (SELECT hh.doc_id, hh.h, ref.h IS NOT NULL AS seen
        |  FROM h hh LEFT JOIN ref ON hh.h = ref.h
        |  WHERE hh.doc_id % 2 = 1)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(sum(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // count(*) AS novelty_ppm
        |FROM t GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // LSH tuning curve P(candidate | s) = 1 − (1 − s^r)^b on a ppm
    // grid (r=4, b=16 — q28/q30's operating point), exact integer via
    // repeated squaring with floor rescale — the planner artifact
    // that picks banding before a run commits to a threshold.
    "q399_lsh_curve" -> Q(
      (s, dir) => Dedup.lshCandidateCurve(s, r = 4, b = 16,
          stepPpm = 50000L)
        .orderBy(col("s_ppm")),
      Some("""WITH g AS (SELECT i AS s_ppm
        |  FROM range(0, 1000001, 50000) t(i)),
        |p2 AS (SELECT s_ppm, (s_ppm * s_ppm) // 1000000 AS x FROM g),
        |p4 AS (SELECT s_ppm, (x * x) // 1000000 AS sr_ppm FROM p2),
        |y1 AS (SELECT s_ppm, sr_ppm, 1000000 - sr_ppm AS y FROM p4),
        |y2 AS (SELECT s_ppm, sr_ppm, (y * y) // 1000000 AS y FROM y1),
        |y4 AS (SELECT s_ppm, sr_ppm, (y * y) // 1000000 AS y FROM y2),
        |y8 AS (SELECT s_ppm, sr_ppm, (y * y) // 1000000 AS y FROM y4),
        |y16 AS (SELECT s_ppm, sr_ppm, (y * y) // 1000000 AS y FROM y8)
        |SELECT CAST(s_ppm AS BIGINT) AS s_ppm,
        |  CAST(sr_ppm AS BIGINT) AS sr_ppm,
        |  CAST(1000000 - y AS BIGINT) AS p_cand_ppm
        |FROM y16 ORDER BY s_ppm""".stripMargin)),

    // Dictionary-scale blocklist matching: phrases join against
    // exploded token n-grams per phrase length — the formulation that
    // survives 100k-phrase blocklists where a regex union dies. Every
    // occurrence counts; the verdict row exists for every doc.
    "q398_blocklist_match" -> Q(
      (s, dir) => {
        import s.implicits._
        val phrases = Seq("spark", "fast hash", "value table part")
          .toDF("phrase")
        QualityFilters.blocklistMatch(
            Tables.documents(s, dir), "doc_id", "text",
            phrases, "phrase")
          .orderBy(col("doc_id"))
      },
      Some("""WITH ph(p, n) AS (VALUES ('spark', 1), ('fast hash', 2),
        |  ('value table part', 3)),
        |t AS (SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+')
        |    END AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(tk) AS g, 1 AS n FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |      THEN list_transform(range(1, len(tk)),
        |        i -> array_to_string(tk[i:i+1], ' '))
        |      ELSE CAST([] AS VARCHAR[]) END), 2
        |  FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE CAST([] AS VARCHAR[]) END), 3
        |  FROM t),
        |m AS (SELECT g.doc_id, g.g
        |  FROM g JOIN ph ON g.g = ph.p AND g.n = ph.n),
        |a AS (SELECT doc_id, count(*) AS n_hits,
        |    CAST(count(DISTINCT g) AS BIGINT) AS n_phrases,
        |    array_to_string(list_sort(list(DISTINCT g)), '|')
        |      AS phrases_hit
        |  FROM m GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_hits, 0) AS n_hits,
        |  coalesce(a.n_phrases, 0) AS n_phrases,
        |  coalesce(a.phrases_hit, '') AS phrases_hit,
        |  coalesce(a.n_hits, 0) > 0 AS blocked
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // Aho-Corasick native kernel for the SAME blocklist semantics:
    // one automaton pass per row, O(tokens + matches) independent of
    // dictionary size — the 100k-phrase path where q398's
    // per-phrase-length exploded joins cost one corpus pass per
    // length. The oracle is q398's verbatim: native ≡ join-based ≡
    // SQL, end to end.
    "q488_blocklist_native" -> Q(
      (s, dir) => {
        val m = graft.expressions.DictionaryMatches.matches(col("text"),
          Seq("spark", "fast hash", "value table part"))
        Tables.documents(s, dir)
          .select(col("doc_id"), m.as("__m"))
          .select(col("doc_id"),
            size(col("__m")).cast("long").as("n_hits"),
            size(array_distinct(col("__m"))).cast("long").as("n_phrases"),
            array_join(array_sort(array_distinct(col("__m"))), "|")
              .as("phrases_hit"))
          .withColumn("blocked", col("n_hits") > 0)
          .orderBy(col("doc_id"))
      },
      Some("""WITH ph(p, n) AS (VALUES ('spark', 1), ('fast hash', 2),
        |  ('value table part', 3)),
        |t AS (SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+')
        |    END AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(tk) AS g, 1 AS n FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |      THEN list_transform(range(1, len(tk)),
        |        i -> array_to_string(tk[i:i+1], ' '))
        |      ELSE CAST([] AS VARCHAR[]) END), 2
        |  FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |        i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE CAST([] AS VARCHAR[]) END), 3
        |  FROM t),
        |m AS (SELECT g.doc_id, g.g
        |  FROM g JOIN ph ON g.g = ph.p AND g.n = ph.n),
        |a AS (SELECT doc_id, count(*) AS n_hits,
        |    CAST(count(DISTINCT g) AS BIGINT) AS n_phrases,
        |    array_to_string(list_sort(list(DISTINCT g)), '|')
        |      AS phrases_hit
        |  FROM m GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_hits, 0) AS n_hits,
        |  coalesce(a.n_phrases, 0) AS n_phrases,
        |  coalesce(a.phrases_hit, '') AS phrases_hit,
        |  coalesce(a.n_hits, 0) > 0 AS blocked
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // Curriculum ordering: docs phase by readability tertile (easy →
    // hard, thresholds from the exact nearest-rank bisect — no global
    // sort) with a deterministic md5 shuffle key inside each phase.
    // The training-order artifact of curriculum learning, fully
    // scan-shaped: the only aggregates are the O(log range) bisect
    // probes.
    "q397_curriculum" -> Q(
      (s, dir) => {
        // readability's regex passes are CPU-dense and the local
        // source is one split — spread so both consumers (the bisect
        // cache and the output projection) run wide (guide §2.2)
        val r = TextAnalysis.readability(
            graft.operators.Spread.byKey(
              Tables.documents(s, dir).select(col("doc_id"), col("text")),
              "doc_id"),
            "text")
          .select(col("doc_id"), col("flesch_milli"))
          .filter(col("flesch_milli").isNotNull)
        val th = Corpus.quantilesBisect(r, "flesch_milli",
            Seq(0.33, 0.67))
          .select(col("q_33"), col("q_67"))
        r.crossJoin(broadcast(th))
          .withColumn("phase",
            when(col("flesch_milli") >= col("q_67"), 0L)
              .when(col("flesch_milli") >= col("q_33"), 1L)
              .otherwise(2L))
          .withColumn("order_key",
            md5(concat(lit("cur:"), col("doc_id"))))
          .select(col("doc_id"), col("flesch_milli"), col("phase"),
            col("order_key"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id,
        |    CASE WHEN w = 0 THEN CAST(NULL AS BIGINT)
        |         ELSE 206835 - (1015 * w) // s - (84600 * y) // w
        |    END AS fm
        |  FROM (SELECT doc_id,
        |      CAST(CASE WHEN trim(text) = '' THEN 0
        |           ELSE len(string_split_regex(trim(text), '\s+'))
        |      END AS BIGINT) AS w,
        |      greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |        AS BIGINT), 1) AS s,
        |      CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |        AS BIGINT) AS y
        |    FROM documents)),
        |v AS (SELECT doc_id, fm FROM f WHERE fm IS NOT NULL),
        |r AS (SELECT fm, row_number() OVER (ORDER BY fm) AS rnk,
        |    count(*) OVER () AS n FROM v),
        |t AS (SELECT
        |    max(CASE WHEN rnk = ceil(0.33 * n) THEN fm END) AS q33,
        |    max(CASE WHEN rnk = ceil(0.67 * n) THEN fm END) AS q67
        |  FROM r)
        |SELECT v.doc_id, v.fm AS flesch_milli,
        |  CAST(CASE WHEN v.fm >= t.q67 THEN 0
        |       WHEN v.fm >= t.q33 THEN 1 ELSE 2 END AS BIGINT) AS phase,
        |  md5('cur:' || v.doc_id) AS order_key
        |FROM v, t ORDER BY doc_id""".stripMargin)),

    // Fill-in-the-middle: two hash-chosen token cuts per doc, PSM
    // re-order (<PRE> prefix <SUF> suffix <MID> middle) — the
    // infilling objective's data prep, deterministic cuts so the
    // oracle rebuilds every string exactly.
    "q390_fim_transform" -> Q(
      (s, dir) => Corpus.fimTransform(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |    ${h60sql("'fim1:' || doc_id")} % (len(toks) + 1) AS c1
        |  FROM t),
        |c2t AS (SELECT doc_id, toks, n, c1,
        |    c1 + ${h60sql("'fim2:' || doc_id")} % (n - c1 + 1) AS c2
        |  FROM c)
        |SELECT doc_id, n AS n_tokens, c1, c2,
        |  '<PRE> ' || coalesce(array_to_string(
        |    toks[1:CAST(c1 AS INT)], ' '), '') ||
        |  ' <SUF> ' || coalesce(array_to_string(
        |    toks[CAST(c2 + 1 AS INT):CAST(n AS INT)], ' '), '') ||
        |  ' <MID> ' || coalesce(array_to_string(
        |    toks[CAST(c1 + 1 AS INT):CAST(c2 AS INT)], ' '), '')
        |    AS psm_text
        |FROM c2t ORDER BY doc_id""".stripMargin)),

    // Flesch reading-ease in exact integer milli-units (order-free
    // floor divisions; see TextAnalysis.readability) — the classic
    // readability prior quality-filter stacks add next to q27's
    // length/punct heuristics.
    "q181_readability" -> Q(
      (s, dir) => graft.operators.TextAnalysis.readability(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "text")
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"), col("flesch_milli"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, w AS n_words, s AS n_sentences,
        |  y AS n_syllables,
        |  CASE WHEN w = 0 THEN CAST(NULL AS BIGINT)
        |       ELSE 206835 - (1015 * w) // s - (84600 * y) // w
        |  END AS flesch_milli
        |FROM (SELECT doc_id,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+'))
        |    END AS BIGINT) AS w,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS y
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)),

    // Sequence-packing efficiency: tokens vs padded slots at a 64-token
    // sequence length, per source — the waste number that motivates
    // q80's bin packing over one-doc-per-sequence batching.
    "q182_padding_waste" -> Q(
      (s, dir) => graft.operators.Corpus.paddingWaste(
          Tables.documents(s, dir), "text", "source", seqLen = 64)
        .orderBy(col("source")),
      Some("""WITH d AS (SELECT source,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+'))
        |    END AS BIGINT) AS n
        |  FROM documents),
        |p AS (SELECT source, n, ((n + 63) // 64) * 64 AS padded FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(sum(padded) AS BIGINT) AS n_padded,
        |  CASE WHEN sum(padded) = 0 THEN 0
        |       ELSE (1000000 * CAST(sum(padded) - sum(n) AS BIGINT))
        |         // CAST(sum(padded) AS BIGINT)
        |  END AS waste_ppm
        |FROM p GROUP BY source
        |ORDER BY source""".stripMargin)),

    // Vocabulary building: corpus-wide token frequencies (the
    // tokenizer-training input). One explode + one count shuffle —
    // at 100 TB this is the canonical wordcount whose partial
    // aggregation keeps the shuffle proportional to |vocab|.
    "q40_vocabulary" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(explode(graft.expressions.WordShingles.shinglesNative(
          col("text"), 1)).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 10)
        .orderBy(col("token")),
      Some(s"""SELECT token, count(*) AS n
        |FROM (SELECT unnest($tokensSql) AS token FROM documents)
        |GROUP BY token
        |HAVING count(*) >= 10
        |ORDER BY token""".stripMargin)),

    // The canonical corpus quality gate: keep documents that clear the
    // quality score and language filter — the compose-everything
    // filter a training-data pipeline runs before tokenization.
    "q41_corpus_filter" -> Q(
      // ~2 text passes per row beyond tokenization (punct regex + CJK
      // in langIdFrom): all four stopword profiles count in ONE native
      // pass, and quality/langId are arithmetic over the columns
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          length(col("text")).as("__chars"),
          TextAnalysis.nTokens(col("text")).as("__nt"),
          TextAnalysis.punctCount(col("text")).as("__np"),
          graft.expressions.StopwordSetCounts.counts(col("text"), Seq(
            TextAnalysis.LangProfiles.en, TextAnalysis.LangProfiles.de,
            TextAnalysis.LangProfiles.fr, TextAnalysis.LangProfiles.es))
            .as("__sw"))
        .select(col("doc_id"),
          TextAnalysis.qualityScoreFrom(col("__nt"), col("__np"),
            col("__chars"), col("__sw")(0)).as("quality"),
          TextAnalysis.langIdFrom(col("text"), col("__sw")(0),
            col("__sw")(1), col("__sw")(2), col("__sw")(3)).as("pred_lang"))
        .withColumn("kept",
          (col("quality") >= 0.5 && col("pred_lang") === "en").cast("int"))
        .orderBy(col("doc_id")),
      {
        def sw(words: Seq[String]) =
          s"len(regexp_extract_all(lower(text), '${swPattern(words)}'))"
        val (en, de, fr, es) = (sw(TextAnalysis.LangProfiles.en),
          sw(TextAnalysis.LangProfiles.de), sw(TextAnalysis.LangProfiles.fr),
          sw(TextAnalysis.LangProfiles.es))
        val quality =
          s"""least(1.0, len($tokensSql) / 50.0)
             |    * (1.0 - least(1.0, len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) * 5.0))
             |    * least(1.0, $en / greatest(len($tokensSql), 1) * 10.0)""".stripMargin
        val lang =
          s"""CASE WHEN text IS NULL THEN NULL
             |       WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) * 20 > length(text) THEN 'zh'
             |       WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
             |       WHEN $de >= $fr AND $de >= $es THEN 'de'
             |       WHEN $fr >= $es THEN 'fr'
             |       ELSE 'es' END""".stripMargin
        Some(s"""SELECT doc_id,
          |  $quality AS quality,
          |  $lang AS pred_lang,
          |  CAST(($quality) >= 0.5 AND ($lang) = 'en' AS INT) AS kept
          |FROM documents
          |ORDER BY doc_id""".stripMargin)
      }),

    // Writing-system profile: six script classes counted in ONE native
    // character walk (ScriptCounts) vs six regex passes in the oracle;
    // dominant-script argmax with fixed priority. The corpus is mostly
    // Latin/CJK, so non-Latin suffixes are planted deterministically
    // per doc_id — Scala-built literals on the Spark side, repeat()
    // on the DuckDB side, same codepoints.
    "q136_script_profile" -> Q(
      (s, dir) => {
        val suffix = when(col("doc_id") % 6 === 1, lit("а" * 200))
          .when(col("doc_id") % 6 === 2, lit("α" * 150))
          .when(col("doc_id") % 6 === 3, lit("ا" * 180))
          .when(col("doc_id") % 6 === 4, lit("가" * 160))
          .when(col("doc_id") % 6 === 5, lit("а" * 60 + "ا" * 60))
          .otherwise(lit(""))
        val names = TextAnalysis.ScriptClasses.map(_._1)
        Tables.documents(s, dir)
          .select(col("doc_id"),
            concat(col("text"), suffix).as("__t"))
          .select(col("doc_id"),
            TextAnalysis.scriptCounts(col("__t")).as("__sc"))
          .select(col("doc_id") +: col("__sc").isNull.as("__null") +:
            names.zipWithIndex.map { case (n, i) =>
              col("__sc")(i).cast("long").as(s"c_$n") }: _*)
          .withColumn("script", when(col("__null"), lit(null).cast("string"))
            .otherwise(TextAnalysis.dominantScript(
              names.map(n => col(s"c_$n")))))
          .drop("__null")
          .orderBy(col("doc_id"))
      },
      {
        val classes = TextAnalysis.ScriptClasses
        val counts = classes.map { case (n, ivs) =>
          s"len(regexp_extract_all(t, '${TextAnalysis.scriptClassRegex(ivs)}')) AS c_$n" }
        val names = classes.map(_._1)
        val argmax = names.init.zipWithIndex.reverse.foldLeft(
          s"'${names.last}'") { case (els, (n, i)) =>
          val cond = names.drop(i + 1).map(m => s"c_$n >= c_$m")
            .mkString(" AND ")
          s"CASE WHEN $cond THEN '$n' ELSE $els END"
        }
        val allZero = names.map(n => s"c_$n = 0").mkString(" AND ")
        Some(s"""WITH aug AS (
          |  SELECT doc_id, text ||
          |    CASE CAST(doc_id % 6 AS INT)
          |      WHEN 1 THEN repeat('а', 200)
          |      WHEN 2 THEN repeat('α', 150)
          |      WHEN 3 THEN repeat('ا', 180)
          |      WHEN 4 THEN repeat('가', 160)
          |      WHEN 5 THEN repeat('а', 60) || repeat('ا', 60)
          |      ELSE '' END AS t
          |  FROM documents),
          |c AS (SELECT doc_id, t, ${counts.mkString(",\n          |  ")}
          |      FROM aug)
          |SELECT doc_id, ${names.map(n => s"CAST(c_$n AS BIGINT) AS c_$n")
            .mkString(", ")},
          |  CASE WHEN t IS NULL THEN NULL
          |       WHEN $allZero THEN 'none' ELSE $argmax END AS script
          |FROM c
          |ORDER BY doc_id""".stripMargin)
      }),

    // The Gopher rule battery (Rae et al. 2021 §A1.1): published
    // quality heuristics as integer-exact ppm — mean word length,
    // alphabetic-word ratio, symbol ratio, bullet/ellipsis/duplicate
    // line fractions — plus the conjunction threshold flag.
    "q144_gopher_rules" -> Q(
      (s, dir) => QualityFilters.gopherRules(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, coalesce(text, '') AS txt
        |       FROM documents),
        |tk AS (SELECT doc_id, txt,
        |    CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(txt), '\s+') END AS toks
        |  FROM d),
        |w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks,
        |      t -> length(t))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(toks,
        |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha,
        |    CAST(len(regexp_extract_all(txt, '#|\.\.\.|…')) AS BIGINT) AS sym
        |  FROM tk),
        |lx AS (SELECT doc_id, unnest(string_split(txt, chr(10))) AS ln
        |       FROM d),
        |la AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |    count(DISTINCT ln) AS dl,
        |    count(CASE WHEN regexp_matches(ln, '^\s*[-*•]')
        |          THEN 1 END) AS bullet,
        |    count(CASE WHEN regexp_matches(ln, '(\.\.\.|…)\s*$')
        |          THEN 1 END) AS ellip
        |  FROM lx GROUP BY doc_id),
        |base AS (SELECT w.doc_id, n_words,
        |    CASE WHEN n_words > 0 THEN (100 * sum_len) // n_words
        |         ELSE 0 END AS mean_word_len_e2,
        |    CASE WHEN n_words > 0 THEN (1000000 * alpha) // n_words
        |         ELSE 0 END AS alpha_word_ppm,
        |    CASE WHEN n_words > 0 THEN (1000000 * sym) // n_words
        |         ELSE 0 END AS symbol_word_ppm,
        |    n_lines,
        |    (1000000 * bullet) // n_lines AS bullet_line_ppm,
        |    (1000000 * ellip) // n_lines AS ellipsis_line_ppm,
        |    (1000000 * (n_lines - dl)) // n_lines AS dup_line_ppm
        |  FROM w JOIN la ON w.doc_id = la.doc_id)
        |SELECT *, (n_words >= 50
        |    AND mean_word_len_e2 BETWEEN 300 AND 1000
        |    AND alpha_word_ppm >= 800000
        |    AND symbol_word_ppm < 100000
        |    AND bullet_line_ppm < 900000
        |    AND ellipsis_line_ppm < 300000
        |    AND dup_line_ppm < 300000) AS gopher_pass
        |FROM base
        |ORDER BY doc_id""".stripMargin)),

    // The C4 battery (Raffel et al. 2020 §2.2): terminal-punctuation
    // and short-line ratios, sentence floor, brace / lorem-ipsum page
    // drops — q144's companion, same ppm discipline.
    "q145_c4_rules" -> Q(
      (s, dir) => QualityFilters.c4Rules(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, coalesce(text, '') AS txt
        |       FROM documents),
        |b AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(txt, '[.!?]')) AS BIGINT)
        |      AS n_sentences,
        |    contains(txt, '{') AS has_brace,
        |    contains(lower(txt), 'lorem ipsum') AS has_lorem
        |  FROM d),
        |lx AS (SELECT doc_id, unnest(string_split(txt, chr(10))) AS ln
        |       FROM d),
        |la AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |    count(CASE WHEN regexp_matches(ln, '[.!?"]\s*$')
        |          THEN 1 END) AS term,
        |    count(CASE WHEN len(CASE WHEN trim(ln) = ''
        |            THEN CAST([] AS VARCHAR[])
        |            ELSE string_split_regex(trim(ln), '\s+') END) < 5
        |          THEN 1 END) AS short
        |  FROM lx GROUP BY doc_id)
        |SELECT b.doc_id, n_lines,
        |  (1000000 * term) // n_lines AS term_punct_line_ppm,
        |  (1000000 * short) // n_lines AS short_line_ppm,
        |  n_sentences, has_brace, has_lorem,
        |  (n_sentences >= 3 AND NOT has_brace AND NOT has_lorem)
        |    AS c4_keep
        |FROM b JOIN la ON b.doc_id = la.doc_id
        |ORDER BY b.doc_id""".stripMargin)),

    // Language-ID evaluation: the q27 predictor against the corpus'
    // labeled lang column as a confusion matrix — the accuracy
    // dashboard for any heuristic classifier in the pipeline. Null
    // predictions (null text) coalesce to 'unknown' in both engines
    // so the group set is total.
    "q151_lang_confusion" -> Q(
      (s, dir) => {
        val t = col("text")
        Tables.documents(s, dir)
          .select(col("lang"), t,
            graft.expressions.StopwordSetCounts.counts(t, Seq(
              TextAnalysis.LangProfiles.en, TextAnalysis.LangProfiles.de,
              TextAnalysis.LangProfiles.fr, TextAnalysis.LangProfiles.es))
              .as("__sw"))
          .select(col("lang"),
            coalesce(TextAnalysis.langIdFrom(t, col("__sw")(0),
              col("__sw")(1), col("__sw")(2), col("__sw")(3)),
              lit("unknown")).as("pred_lang"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      {
        def sw(words: Seq[String]) =
          s"len(regexp_extract_all(lower(text), '${swPattern(words)}'))"
        val (en, de, fr, es) = (sw(TextAnalysis.LangProfiles.en),
          sw(TextAnalysis.LangProfiles.de), sw(TextAnalysis.LangProfiles.fr),
          sw(TextAnalysis.LangProfiles.es))
        Some(s"""SELECT lang,
          |  coalesce(CASE WHEN text IS NULL THEN NULL
          |    WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) * 20
          |      > length(text) THEN 'zh'
          |    WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
          |    WHEN $de >= $fr AND $de >= $es THEN 'de'
          |    WHEN $fr >= $es THEN 'fr'
          |    ELSE 'es' END, 'unknown') AS pred_lang,
          |  count(*) AS n
          |FROM documents
          |GROUP BY lang, pred_lang
          |ORDER BY lang, pred_lang""".stripMargin)
      }),

    // END-TO-END corpus prep: quality battery → head-fingerprint
    // dedup → source-mixture sample → per-source gold summary, every
    // stage the SAME operator its standalone gate proves (q144
    // gopherRules, q25's exactDedup, q85's mixtureSample) — the gate
    // that shows the stages COMPOSE. The dedup key is the first 10
    // tokens (crawl "same head" dedup) because this corpus has no
    // full-text duplicates; c4Rules sits out (its sentence floor
    // zeroes a punctuation-free synthetic corpus — gated standalone
    // in q145). Every stage is a scan-speed projection or a
    // doc_id/fp-keyed shuffle; the output is source-cardinality rows.
    "q203_corpus_pipeline" -> Q(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pass = QualityFilters.gopherRules(docs, "doc_id", "text")
          .filter(col("gopher_pass")).select(col("doc_id"))
        val quality = docs.join(pass, "doc_id")
        val headFp = md5(concat_ws(" ", slice(
          TextAnalysis.tokens(lower(coalesce(col("text"), lit("")))),
          1, 10)))
        val keepers = Dedup.exactDedup(quality, "doc_id", headFp)
          .select(col("keep_id").as("doc_id"))
        val sampled = Corpus.mixtureSample(
          quality.join(keepers, "doc_id"), "doc_id", "pipe1", "source",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultRate = 0.1)
        sampled.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.nTokens(col("text")).cast("long"))
              .as("n_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT doc_id, source, coalesce(text, '') AS txt,
        |         text FROM documents),
        |tk AS (SELECT doc_id, txt,
        |    CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(txt), '\s+') END AS toks
        |  FROM d),
        |w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks,
        |      t -> length(t))), 0) AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(toks,
        |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha,
        |    CAST(len(regexp_extract_all(txt, '#|\.\.\.|…')) AS BIGINT) AS sym
        |  FROM tk),
        |lx AS (SELECT doc_id, unnest(string_split(txt, chr(10))) AS ln
        |       FROM d),
        |la AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |    count(DISTINCT ln) AS dl,
        |    count(CASE WHEN regexp_matches(ln, '^\s*[-*•]')
        |          THEN 1 END) AS bullet,
        |    count(CASE WHEN regexp_matches(ln, '(\.\.\.|…)\s*$')
        |          THEN 1 END) AS ellip
        |  FROM lx GROUP BY doc_id),
        |g AS (SELECT w.doc_id FROM w JOIN la ON w.doc_id = la.doc_id
        |  WHERE n_words >= 50
        |    AND (100 * sum_len) // n_words BETWEEN 300 AND 1000
        |    AND (1000000 * alpha) // n_words >= 800000
        |    AND (1000000 * sym) // n_words < 100000
        |    AND (1000000 * bullet) // n_lines < 900000
        |    AND (1000000 * ellip) // n_lines < 300000
        |    AND (1000000 * (n_lines - dl)) // n_lines < 300000),
        |q AS (SELECT d.doc_id, d.source, d.text
        |      FROM d JOIN g ON d.doc_id = g.doc_id),
        |k AS (SELECT min(doc_id) AS doc_id FROM q
        |      GROUP BY md5(array_to_string(list_slice(
        |        string_split_regex(trim(lower(coalesce(text, ''))),
        |          '\s+'), 1, 10), ' '))),
        |dd AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.doc_id),
        |sm AS (SELECT * FROM dd
        |  WHERE CAST(('0x' || substr(md5(doc_id || ':pipe1'), 1, 15))
        |      AS BIGINT) % 1000000 <
        |    CASE source WHEN 'src0' THEN 1000000
        |         WHEN 'src1' THEN 500000 WHEN 'src2' THEN 250000
        |         ELSE 100000 END)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+')))
        |    AS BIGINT) AS n_tokens
        |FROM sm GROUP BY 1
        |ORDER BY source""".stripMargin)),

    // Model-based quality filtering: a logistic-regression scorer
    // (rational fast-sigmoid, quantized full-batch GD — see
    // operators.Classifier) trained IN THE GATE on
    // length/punct/stopword features against the lang=='en' label,
    // then scoring every document. The oracle replays both GD rounds
    // as CTEs — the trainer itself is under the hash, not just the
    // scores.
    "q213_lr_quality" -> Q(
      (s, dir) => lrScoredFrame(s, dir).orderBy(col("doc_id")),
      Some(lrQualityOracle)),

    // Incremental-ingest dedup: the doc_id%10 "new batch" probed
    // against the rest of the corpus via the asymmetric LSH index
    // join. The oracle is the asymmetric ALL-PAIRS truth (every
    // new×old pair with unigram Jaccard ≥ 0.9 reduced to the best
    // match per new doc) — a green hash is the per-run proof that the
    // index probe reached full recall, the q77 discipline.
    "q214_incremental_dedup" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        Dedup.incrementalNearDup(
            d.filter(col("doc_id") % 10 === 0),
            d.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", shingleN = 1, k = 32, bands = 16,
            threshold = 0.9)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH nb AS (
        |  SELECT doc_id, list_distinct($normTokens) AS toks
        |  FROM documents WHERE doc_id % 10 = 0),
        |oc AS (
        |  SELECT doc_id, list_distinct($normTokens) AS toks
        |  FROM documents WHERE doc_id % 10 <> 0),
        |jp AS (
        |  SELECT id_a, id_b, jaccard FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      len(list_intersect(a.toks, b.toks))::DOUBLE /
        |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        |    FROM nb a CROSS JOIN oc b)
        |  WHERE jaccard >= 0.9),
        |best AS (SELECT id_a, id_b, jaccard FROM (
        |    SELECT id_a, id_b, jaccard,
        |      row_number() OVER (PARTITION BY id_a
        |        ORDER BY jaccard DESC, id_b) AS rn FROM jp)
        |  WHERE rn = 1)
        |SELECT nb.doc_id, best.id_b AS match_id,
        |  best.jaccard AS match_jaccard,
        |  best.id_b IS NULL AS is_novel
        |FROM nb LEFT JOIN best ON nb.doc_id = best.id_a
        |ORDER BY nb.doc_id""".stripMargin)),

    // EXACT set-similarity self-join by prefix filtering (AllPairs/
    // PPJoin): every pair with distinct-unigram Jaccard ≥ 60%, zero
    // false negatives, no signatures. The oracle is the ALL-PAIRS
    // truth with NO prefix condition — a green hash proves the
    // rare-first prefix + size filters are pure access path (the q131
    // pigeonhole discipline, here from the prefix-filter lemma). All
    // gate arithmetic is integer: cross-multiplied threshold, ppm
    // readout by integer division.
    // Gate slice: the synthetic corpus has a 31-token vocabulary, so
    // set similarity is DENSE — the full sf0.1 corpus has ~7M TRUE
    // pairs at t=0.6 (measured), a result-size property of the data,
    // not an access-path failure. The gate runs the 20% doc_id%5
    // slice (result ÷25) so the bench measures the algorithm, not
    // the materialization of a saturated pair set; on natural text
    // (Zipf vocab) the prefix filter prunes as designed.
    "q242_prefix_filter_join" -> Q(
      (s, dir) => Dedup.prefixFilterJaccardJoin(
          Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
          "doc_id", "text", thresholdPct = 60)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH t AS (
        |  SELECT DISTINCT doc_id, unnest($tokensSql) AS tok
        |  FROM documents WHERE doc_id % 5 = 0),
        |s AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY 1),
        |i AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
        |  (1000000 * inter) // (sa.sz + sb.sz - inter) AS jacc_ppm
        |FROM i
        |JOIN s sa ON sa.doc_id = id_a
        |JOIN s sb ON sb.doc_id = id_b
        |WHERE 100 * inter >= 60 * (sa.sz + sb.sz - inter)
        |ORDER BY id_a, id_b""".stripMargin)),

    // Quantile normalization of per-source length scores onto the
    // global distribution: normalized = the global value SELECTED at
    // rank ⌈r_s·N/n_s⌉ (integer cross-multiplication, nearest-rank —
    // never interpolated), making scores comparable across sources.
    "q255_quantile_normalize" -> Q(
      (s, dir) => graft.operators.QuantileNorm.normalize(
          Tables.documents(s, dir), "doc_id", "source", "n_chars")
        .orderBy(col("doc_id")),
      Some("""WITH d AS (
        |  SELECT doc_id, source, n_chars FROM documents),
        |st AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS src_rank,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
        |      AS n_src
        |  FROM d),
        |g AS (
        |  SELECT n_chars AS normalized,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id)
        |      AS BIGINT) AS rg
        |  FROM d),
        |n AS (SELECT count(*) AS nn FROM d),
        |m AS (
        |  SELECT doc_id, source, n_chars, src_rank, n_src,
        |    (src_rank * nn + n_src - 1) // n_src AS target_rank
        |  FROM st CROSS JOIN n)
        |SELECT m.doc_id, m.source, m.n_chars, m.src_rank, m.n_src,
        |  m.target_rank, g.normalized
        |FROM m JOIN g ON g.rg = m.target_rank
        |ORDER BY m.doc_id""".stripMargin)),

    // Pretraining block-packing layout: docs concatenate in id order
    // with an EOS separator and chunk into 128-token blocks crossing
    // doc boundaries; each doc's placement (global offset, first /
    // last block, boundary-split flag) is exact integer bookkeeping —
    // the attention-mask accounting a loader needs, computed without
    // materializing a single token.
    "q257_pack_blocks" -> Q(
      (s, dir) => Corpus.packBlocks(
          Tables.documents(s, dir), "doc_id", "text", blockSize = 128)
        .orderBy(col("doc_id")),
      Some(s"""WITH d AS (
        |  SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens + 1) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS global_start
        |  FROM d)
        |SELECT doc_id, n_tokens, global_start,
        |  global_start // 128 AS start_block,
        |  (global_start + greatest(n_tokens, 1) - 1) // 128
        |    AS end_block,
        |  (global_start + greatest(n_tokens, 1) - 1) // 128
        |    > global_start // 128 AS spans_boundary
        |FROM o
        |ORDER BY doc_id""".stripMargin)),

    // Stratified 5-fold assignment with EXACT per-source balance:
    // salted-md5 order dealt round-robin — fold sizes within a
    // stratum differ by ≤1 (hash-mod only achieves that in
    // expectation). Deterministic, so the assignment table
    // hash-gates.
    "q268_stratified_kfold" -> Q(
      (s, dir) => Corpus.stratifiedKFold(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source")),
          "doc_id", "source", k = 5, salt = "cv1")
        .orderBy(col("doc_id")),
      Some("""WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id || '#cv1'), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source, CAST((rn - 1) % 5 AS INT) AS fold
        |FROM r
        |ORDER BY doc_id""".stripMargin)),

    // Weak-supervision label aggregation (Snorkel majority-vote
    // baseline): three labeling functions — length rule, language
    // rule, source blocklist — each voting keep/drop or abstaining
    // (null); the aggregate label is the strict majority among
    // non-abstains, null on tie/all-abstain. Pure array expressions
    // riding the scan: no shuffle (the gate's ORDER BY is the only
    // exchange), no UDF.
    "q289_label_vote" -> Q(
      (s, dir) => {
        val lfLen = when(col("n_chars") >= 400, "keep")
          .when(col("n_chars") < 120, "drop")
        val lfLang = when(col("lang") === "en", "keep")
          .when(col("lang") === "zh", "drop")
        val lfSrc = when(col("source").isin("src0", "src1", "src2"),
          "drop")
        val (nVotes, label) = graft.operators.Classifier.majorityVote(
          Seq(lfLen, lfLang, lfSrc))
        Tables.documents(s, dir)
          .select(col("doc_id"), lfLen.as("lf_len"),
            lfLang.as("lf_lang"), lfSrc.as("lf_src"),
            nVotes.as("n_votes"), label.as("label"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH l AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars >= 400 THEN 'keep'
        |         WHEN n_chars < 120 THEN 'drop' END AS lf_len,
        |    CASE WHEN lang = 'en' THEN 'keep'
        |         WHEN lang = 'zh' THEN 'drop' END AS lf_lang,
        |    CASE WHEN source IN ('src0', 'src1', 'src2')
        |         THEN 'drop' END AS lf_src
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lf_len, lf_lang, lf_src,
        |    (CASE WHEN lf_len = 'keep' THEN 1 ELSE 0 END +
        |     CASE WHEN lf_lang = 'keep' THEN 1 ELSE 0 END +
        |     CASE WHEN lf_src = 'keep' THEN 1 ELSE 0 END) AS nk,
        |    (CASE WHEN lf_len = 'drop' THEN 1 ELSE 0 END +
        |     CASE WHEN lf_lang = 'drop' THEN 1 ELSE 0 END +
        |     CASE WHEN lf_src = 'drop' THEN 1 ELSE 0 END) AS nd
        |  FROM l)
        |SELECT doc_id, lf_len, lf_lang, lf_src,
        |  CAST(nk + nd AS BIGINT) AS n_votes,
        |  CASE WHEN nk > nd THEN 'keep'
        |       WHEN nd > nk THEN 'drop' END AS label
        |FROM c
        |ORDER BY doc_id""".stripMargin)),

    // Expected calibration error of the q213 LR scorer: equal-width
    // confidence bins of 500 ppm (sized to the 2-round scorer's
    // narrow dynamic range so the readout is multi-bin),
    // per-bin observed accuracy vs mean confidence in EXACT integer
    // ppm, and the n-weighted |acc − conf| rollup as a window total
    // repeated on every row — one readout, two grains, all under the
    // hash. Shares lrScoredFrame/lrScoredCte with q213, so the
    // calibration audit and the scorer can never disagree on the
    // model.
    // Brier score + Murphy (1973) decomposition over the SAME binned
    // calibration grid as q291: reliability (how far bin confidence
    // sits from bin accuracy), resolution (how far bin accuracy sits
    // from the base rate), uncertainty (base·(1−base)), plus the
    // direct row-grain Brier — all exact-integer ppm computed FROM
    // the truncated binned statistics (identically truncated in both
    // engines; the exact-rational identity REL−RES+UNC=Brier is
    // approximate once binned, which is why the direct Brier is
    // emitted alongside, not derived).
    "q498_brier_decomposition" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        val scored = lrScoredFrame(s, dir).localCheckpoint(true)
        val glob = scored.agg(count(lit(1)).as("n_all"),
            sum(col("label")).as("pos_all"),
            sum((col("score_ppm") - col("label") * 1000000L) *
              (col("score_ppm") - col("label") * 1000000L)).as("sq_all"))
          .withColumn("base_ppm", expr("pos_all * 1000000L div n_all"))
          .withColumn("brier_ppm", expr("sq_all div (n_all * 1000000L)"))
          .withColumn("unc_ppm",
            expr("base_ppm * (1000000L - base_ppm) div 1000000L"))
        scored
          .withColumn("bin", expr("score_ppm div 500"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(col("label")).as("__pos"),
            sum(col("score_ppm")).as("__conf"))
          .select(col("bin"), col("n"),
            expr("__pos * 1000000L div n").as("acc_ppm"),
            expr("__conf div n").as("conf_ppm"))
          .crossJoin(broadcast(glob.select(col("n_all"), col("base_ppm"),
            col("brier_ppm"), col("unc_ppm"))))
          .withColumn("__rel", col("n") *
            (col("conf_ppm") - col("acc_ppm")) *
            (col("conf_ppm") - col("acc_ppm")))
          .withColumn("__res", col("n") *
            (col("acc_ppm") - col("base_ppm")) *
            (col("acc_ppm") - col("base_ppm")))
          .withColumn("rel_ppm",
            expr("sum(__rel) over () div (n_all * 1000000L)"))
          .withColumn("res_ppm",
            expr("sum(__res) over () div (n_all * 1000000L)"))
          .drop("__rel", "__res", "n_all")
          .orderBy(col("bin"))
      },
      Some(s"""$lrScoredCte,
        |gst AS (
        |  SELECT count(*) AS n_all,
        |    CAST(sum(label) AS BIGINT) AS pos_all,
        |    CAST(sum((score_ppm - label * 1000000) *
        |      (score_ppm - label * 1000000)) AS BIGINT) AS sq_all
        |  FROM sc),
        |gsum AS (SELECT n_all,
        |    (pos_all * 1000000) // n_all AS base_ppm,
        |    sq_all // (n_all * 1000000) AS brier_ppm
        |  FROM gst),
        |b AS (
        |  SELECT score_ppm // 500 AS bin, count(*) AS n,
        |    CAST(sum(label) AS BIGINT) AS pos,
        |    CAST(sum(score_ppm) AS BIGINT) AS conf
        |  FROM sc GROUP BY 1),
        |p AS (
        |  SELECT bin, n, pos * 1000000 // n AS acc_ppm,
        |    conf // n AS conf_ppm
        |  FROM b)
        |SELECT p.bin, p.n, p.acc_ppm, p.conf_ppm,
        |  gsum.base_ppm, gsum.brier_ppm,
        |  gsum.base_ppm * (1000000 - gsum.base_ppm) // 1000000 AS unc_ppm,
        |  CAST(sum(p.n * (p.conf_ppm - p.acc_ppm) *
        |      (p.conf_ppm - p.acc_ppm)) OVER () //
        |    (gsum.n_all * 1000000) AS BIGINT) AS rel_ppm,
        |  CAST(sum(p.n * (p.acc_ppm - gsum.base_ppm) *
        |      (p.acc_ppm - gsum.base_ppm)) OVER () //
        |    (gsum.n_all * 1000000) AS BIGINT) AS res_ppm
        |FROM p, gsum
        |ORDER BY p.bin""".stripMargin)),

    "q291_calibration_ece" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        lrScoredFrame(s, dir)
          .withColumn("bin", expr("score_ppm div 500"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(col("label")).as("n_pos"),
            sum(col("score_ppm")).as("conf_sum"))
          .select(col("bin"), col("n"),
            expr("n_pos * 1000000L div n").as("acc_ppm"),
            expr("conf_sum div n").as("conf_ppm"))
          .withColumn("gap_ppm",
            abs(col("acc_ppm") - col("conf_ppm")))
          .withColumn("__gsum", sum(col("gap_ppm") * col("n")).over(w))
          .withColumn("__nsum", sum(col("n")).over(w))
          // integral div — a double window-mean could round across an
          // integer boundary and break the hash
          .withColumn("ece_ppm", expr("__gsum div __nsum"))
          .drop("__gsum", "__nsum")
          .orderBy(col("bin"))
      },
      Some(s"""$lrScoredCte,
        |b AS (
        |  SELECT score_ppm // 500 AS bin,
        |    count(*) AS n,
        |    CAST(sum(label) AS BIGINT) AS n_pos,
        |    CAST(sum(score_ppm) AS BIGINT) AS conf_sum
        |  FROM sc GROUP BY 1),
        |p AS (
        |  SELECT bin, n, n_pos * 1000000 // n AS acc_ppm,
        |    conf_sum // n AS conf_ppm
        |  FROM b)
        |SELECT bin, n, acc_ppm, conf_ppm,
        |  abs(acc_ppm - conf_ppm) AS gap_ppm,
        |  CAST(sum(abs(acc_ppm - conf_ppm) * n) OVER () //
        |    sum(n) OVER () AS BIGINT) AS ece_ppm
        |FROM p
        |ORDER BY bin""".stripMargin)),

    // ROUGE-1/2 clipped-overlap scoring (the BLEU/ROUGE counting
    // core) over successor pairs within each source: candidate = doc,
    // reference = the source's next doc. n-gram count frames ride one
    // text scan; pair scoring is two gram-keyed joins bounded by the
    // pair list — never a per-pair re-tokenization. All-integer
    // (clipped counts, ppm by integral div), so precision/recall
    // hash-gate.
    "q295_rouge_overlap" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))
        val docs = Tables.documents(s, dir)
        val pairs = docs
          .select(col("doc_id").as("id_a"),
            lead(col("doc_id"), 1).over(w).as("id_b"))
          .filter(col("id_b").isNotNull)
        graft.operators.Eval.rougeOverlap(pairs, docs, "doc_id", "text")
          .orderBy(col("id_a"))
      },
      Some(s"""WITH t AS (
        |  SELECT doc_id, source, $tokensSql AS toks FROM documents),
        |pr AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT doc_id AS id_a,
        |      lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id)
        |        AS id_b
        |    FROM documents)
        |  WHERE id_b IS NOT NULL),
        |uni AS (
        |  SELECT doc_id AS id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(toks) AS g FROM t)
        |  GROUP BY 1, 2),
        |bi AS (
        |  SELECT doc_id AS id, g, count(*) AS c FROM (
        |    SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |    FROM t, LATERAL (SELECT unnest(
        |      generate_series(1, len(toks)-1)) AS i) u)
        |  GROUP BY 1, 2),
        |s1 AS (SELECT id, CAST(sum(c) AS BIGINT) AS n FROM uni
        |       GROUP BY 1),
        |s2 AS (SELECT id, CAST(sum(c) AS BIGINT) AS n FROM bi
        |       GROUP BY 1),
        |c1 AS (
        |  SELECT pr.id_a, pr.id_b,
        |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS clip
        |  FROM pr JOIN uni a ON a.id = pr.id_a
        |  JOIN uni b ON b.id = pr.id_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |c2 AS (
        |  SELECT pr.id_a, pr.id_b,
        |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS clip
        |  FROM pr JOIN bi a ON a.id = pr.id_a
        |  JOIN bi b ON b.id = pr.id_b AND b.g = a.g
        |  GROUP BY 1, 2)
        |SELECT pr.id_a, pr.id_b,
        |  coalesce(sa1.n, 0) AS n_a1, coalesce(sb1.n, 0) AS n_b1,
        |  coalesce(c1.clip, 0) AS clip1,
        |  coalesce(sa2.n, 0) AS n_a2, coalesce(sb2.n, 0) AS n_b2,
        |  coalesce(c2.clip, 0) AS clip2,
        |  coalesce(c1.clip, 0) * 1000000 //
        |    greatest(coalesce(sa1.n, 0), 1) AS p1_ppm,
        |  coalesce(c1.clip, 0) * 1000000 //
        |    greatest(coalesce(sb1.n, 0), 1) AS r1_ppm,
        |  coalesce(c2.clip, 0) * 1000000 //
        |    greatest(coalesce(sa2.n, 0), 1) AS p2_ppm,
        |  coalesce(c2.clip, 0) * 1000000 //
        |    greatest(coalesce(sb2.n, 0), 1) AS r2_ppm
        |FROM pr
        |LEFT JOIN s1 sa1 ON sa1.id = pr.id_a
        |LEFT JOIN s1 sb1 ON sb1.id = pr.id_b
        |LEFT JOIN s2 sa2 ON sa2.id = pr.id_a
        |LEFT JOIN s2 sb2 ON sb2.id = pr.id_b
        |LEFT JOIN c1 ON c1.id_a = pr.id_a AND c1.id_b = pr.id_b
        |LEFT JOIN c2 ON c2.id_a = pr.id_a AND c2.id_b = pr.id_b
        |ORDER BY pr.id_a""".stripMargin)),

    // Feature hashing: vocabulary-free sparse featurization — tokens
    // → fixed 256-bucket index space via the shared md5 hash. One
    // explode + one keyed partial agg; no vocab table to build or
    // broadcast. Long-format (id, idx, cnt) hash-gates exactly.
    "q307_feature_hashing" -> Q(
      (s, dir) => TextAnalysis.hashFeatures(
          Tables.documents(s, dir).filter(col("doc_id") % 10 === 0),
          "doc_id", "text", dim = 256)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("idx")),
      Some(s"""WITH tok AS (
        |  SELECT doc_id, unnest($tokensSql) AS t
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT doc_id, ${h60sql("t")} % 256 AS idx,
        |  count(*) AS cnt
        |FROM tok
        |GROUP BY 1, 2
        |ORDER BY doc_id, idx""".stripMargin)),

    // Leave-one-out target encoding of order priority against the
    // (truncated) order total: the de-leaked categorical featurizer
    // — each row's feature is the mean label of the OTHER rows in
    // its category, exact integer milli. One category-partitioned
    // window over the fact grain.
    "q308_target_encoding" -> Q(
      (s, dir) => graft.operators.Aggregates.targetEncodeLoo(
          Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_orderpriority"),
              expr("CAST(o_totalprice AS LONG)").as("v")),
          "o_orderpriority", "v", "o_orderkey")
        .orderBy(col("o_orderkey")),
      Some("""WITH b AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(trunc(o_totalprice) AS BIGINT) AS v
        |  FROM orders),
        |w AS (
        |  SELECT o_orderkey, o_orderpriority, v,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n_cat,
        |    CAST(sum(v) OVER (PARTITION BY o_orderpriority) AS BIGINT)
        |      AS s
        |  FROM b)
        |SELECT o_orderkey, o_orderpriority, v,
        |  CAST(n_cat AS BIGINT) AS n_cat,
        |  CASE WHEN n_cat > 1
        |       THEN (s - v) * 1000 // (n_cat - 1) END AS loo_milli
        |FROM w
        |ORDER BY o_orderkey""".stripMargin)),

    // Train/serve drift audit (log-free PSI): doc-length share
    // distributions of the even- vs odd-id halves, per-bin |Δ| ppm
    // and the total L1 (= 2·TV distance) — the monitoring readout a
    // scoring pipeline runs before trusting a model trained on
    // yesterday's distribution. All-integer, full-outer bin grid.
    "q309_drift_l1" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        QualityFilters.binShareDrift(
            d.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
            d.filter(col("doc_id") % 2 === 1).select(col("n_chars")),
            "n_chars", width = 100L)
          .orderBy(col("bin"))
      },
      Some("""WITH a AS (
        |  SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bin,
        |    count(*) AS c
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |ap AS (SELECT bin,
        |    CAST(c * 1000000 // sum(c) OVER () AS BIGINT) AS share_a_ppm
        |  FROM a),
        |b AS (
        |  SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bin,
        |    count(*) AS c
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |bp AS (SELECT bin,
        |    CAST(c * 1000000 // sum(c) OVER () AS BIGINT) AS share_b_ppm
        |  FROM b),
        |j AS (
        |  SELECT coalesce(ap.bin, bp.bin) AS bin,
        |    coalesce(share_a_ppm, 0) AS share_a_ppm,
        |    coalesce(share_b_ppm, 0) AS share_b_ppm
        |  FROM ap FULL OUTER JOIN bp ON ap.bin = bp.bin)
        |SELECT bin, share_a_ppm, share_b_ppm,
        |  abs(share_a_ppm - share_b_ppm) AS abs_diff_ppm,
        |  CAST(sum(abs(share_a_ppm - share_b_ppm)) OVER ()
        |    AS BIGINT) AS l1_total_ppm
        |FROM j
        |ORDER BY bin""".stripMargin)),

    // Group-aware K-fold: every doc's fold is a pure md5 function of
    // its dedup GROUP key (here the exact-dup fingerprint), so all
    // copies of a document land in one fold — the split that keeps
    // near-dup leakage out of cross-validation. Per-fold doc and
    // group counts ride along via one fold-keyed agg join.
    "q311_group_kfold" -> Q(
      (s, dir) => {
        val assigned = Corpus.groupKFold(
          Tables.documents(s, dir)
            .select(col("doc_id"),
              TextAnalysis.fingerprintPortable(col("text")).as("fp")),
          "fp", k = 5)
        val foldStats = assigned.groupBy(col("fold"))
          .agg(count(lit(1)).as("fold_docs"),
            countDistinct(col("fp")).as("fold_groups"))
        assigned.join(foldStats, Seq("fold"))
          .select(col("doc_id"), col("fp"), col("fold"),
            col("fold_docs"), col("fold_groups"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH a AS (
        |  SELECT doc_id,
        |    md5(array_to_string(
        |      string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
        |      ' ')) AS fp
        |  FROM documents),
        |f AS (SELECT doc_id, fp, ${h60sql("fp")} % 5 AS fold FROM a),
        |g AS (SELECT fold, count(*) AS fold_docs,
        |    count(DISTINCT fp) AS fold_groups
        |  FROM f GROUP BY fold)
        |SELECT f.doc_id, f.fp, f.fold, g.fold_docs, g.fold_groups
        |FROM f JOIN g USING (fold)
        |ORDER BY f.doc_id""".stripMargin)),

    // FLAGSHIP "prepare a training shard" composition (VERDICT r9
    // item 7): exact A-ES weighted selection (q439) -> MMR-diversified
    // ordering over int8 embedding codes (q442) -> block packing in
    // the diversified order (q257) -> dataset-card readout (q423's
    // shape), gated as ONE hash. Proves the round-9/10 operators
    // compose: every stage's intermediate feeds the next and the
    // oracle replays all four.
    "q454_training_shard" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.Similarity
        // 1. A-ES: 8 docs per source, weight = n_chars
        val picked = Corpus.weightedSampleAes(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id", "n_chars", "source", k = 8, salt = "shard1")
        // 2. MMR rerank to 4 diversified docs per source (query =
        // the source; rel = the A-ES weight; vectors = int8 codes)
        val coded = Tables.embeddings(s, dir).select(
          col("vec_id").as("cand_id"),
          Similarity.quantizeInt8(col("embedding")).getField("q")
            .as("cvec"))
        val cands = picked
          .select(col("source").as("query_id"),
            col("doc_id").as("cand_id"), col("weight").as("rel"))
          .join(coded, "cand_id")
          .select(col("query_id"), col("cand_id"), col("rel"),
            col("cvec"))
        val mmr = Similarity.mmrRerank(cands, lambdaPpm = 700000L,
          k = 4)
        // 3. pack blocks in (source, mmr-rank) order — pack_id is a
        // selection-sized window (sources x 4 rows), never corpus-sized
        val ordered = mmr.select(col("query_id").as("source"),
            col("rank"), col("cand_id").as("doc_id"), col("rel"))
          .withColumn("pack_id", row_number().over(
            Window.orderBy(col("source"), col("rank"))).cast("long"))
        val packed = Corpus.packBlocks(
          ordered.join(Tables.documents(s, dir)
              .select(col("doc_id"), col("text")), "doc_id")
            .select(col("pack_id"), col("text")),
          "pack_id", "text", blockSize = 128)
        // 4. dataset card riding every row (selection-sized window)
        val all = Window.partitionBy()
        ordered.join(packed, "pack_id")
          .withColumn("shard_tokens", sum(col("n_tokens")).over(all))
          .withColumn("shard_blocks", (max(col("end_block")).over(all)
            + 1L).cast("long"))
          .withColumn("n_boundary", sum(col("spans_boundary")
            .cast("long")).over(all))
          .select(col("source"), col("rank"), col("doc_id"), col("rel"),
            col("n_tokens"), col("global_start"), col("start_block"),
            col("end_block"), col("spans_boundary"),
            col("shard_tokens"), col("shard_blocks"), col("n_boundary"))
          .orderBy(col("source"), col("rank"))
      },
      Some {
        def idot(a: String, b: String) =
          s"list_reduce([CAST(0 AS BIGINT)] || list_transform(" +
            s"range(1, 65), i -> $a[i] * $b[i]), (x, y) -> x + y)"
        def round(r: Int): String = {
          val p = r - 1
          s"""m$r AS (SELECT c.query_id, c.cand_id,
             |    max(${idot("c.cvec", "sx.cvec")}) AS maxsim
             |  FROM cand c JOIN sel$p sx USING (query_id)
             |  WHERE NOT EXISTS (SELECT 1 FROM sel$p x
             |    WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id)
             |  GROUP BY 1, 2),
             |w$r AS (SELECT c.query_id, c.cand_id, c.rel, m.maxsim,
             |    c.rel * 700000 - m.maxsim * 300000 AS score, c.cvec
             |  FROM cand c JOIN m$r m ON c.query_id = m.query_id
             |    AND c.cand_id = m.cand_id),
             |sel$r AS MATERIALIZED (SELECT * FROM sel$p UNION ALL
             |  SELECT query_id, CAST($r AS BIGINT) AS rank, cand_id,
             |    rel, maxsim, score, cvec FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, cand_id) AS rn FROM w$r)
             |  WHERE rn = 1)""".stripMargin
        }
        s"""WITH RECURSIVE h AS (SELECT source, doc_id,
          |    CAST(n_chars AS BIGINT) AS w,
          |    CAST(('0x' || substr(md5(doc_id || ':shard1'), 1, 15)) AS BIGINT)
          |      % 4294967296 AS h32
          |  FROM documents WHERE n_chars > 0),
          |src AS (SELECT doc_id AS key, CAST(4294967296 AS BIGINT) AS num,
          |    h32 + 1 AS den FROM h),
          |${graft.functions.FixedPoint.lnPpmSqlCtes("src")},
          |pp AS (SELECT h.source, h.doc_id, h.w,
          |    (l.ln_ppm * 1000000000) // h.w AS priority_e9
          |  FROM h JOIN lnppm l ON h.doc_id = l.key),
          |pick AS MATERIALIZED (SELECT source, doc_id, w FROM (
          |  SELECT source, doc_id, w,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY priority_e9, doc_id) AS rn
          |  FROM pp) WHERE rn <= 8),
          |em AS (SELECT vec_id, embedding,
          |    list_max(list_transform(embedding,
          |      x -> abs(CAST(x AS DOUBLE)))) AS maxabs
          |  FROM embeddings),
          |z AS (SELECT vec_id, list_transform(
          |    range(1, len(embedding) + 1),
          |    i -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)
          |      ELSE CAST(trunc(CAST(embedding[i] AS DOUBLE) /
          |        (maxabs / 127.0)) AS BIGINT) END) AS qv
          |  FROM em),
          |cand AS MATERIALIZED (SELECT pk.source AS query_id,
          |    pk.doc_id AS cand_id, pk.w AS rel, z.qv AS cvec
          |  FROM pick pk JOIN z ON z.vec_id = pk.doc_id),
          |sel1 AS MATERIALIZED (SELECT query_id,
          |    CAST(1 AS BIGINT) AS rank, cand_id,
          |    rel, CAST(0 AS BIGINT) AS maxsim, rel * 700000 AS score,
          |    cvec
          |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          |      ORDER BY rel * 700000 DESC, cand_id) AS rn FROM cand)
          |  WHERE rn = 1),
          |${round(2)},
          |${round(3)},
          |${round(4)},
          |ord AS (SELECT query_id AS source, rank, cand_id AS doc_id,
          |    rel, row_number() OVER (ORDER BY query_id, rank)
          |      AS pack_id
          |  FROM sel4),
          |tk AS (SELECT o.pack_id, o.source, o.rank, o.doc_id, o.rel,
          |    CAST(len($tokensSql) AS BIGINT) AS n_tokens
          |  FROM ord o JOIN documents d ON d.doc_id = o.doc_id),
          |pos AS (SELECT *, CAST(coalesce(sum(n_tokens + 1) OVER (
          |      ORDER BY pack_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS global_start
          |  FROM tk),
          |fin AS (SELECT source, rank, doc_id, rel, n_tokens,
          |    global_start,
          |    global_start // 128 AS start_block,
          |    (global_start + greatest(n_tokens, 1) - 1) // 128
          |      AS end_block,
          |    (global_start + greatest(n_tokens, 1) - 1) // 128
          |      > global_start // 128 AS spans_boundary
          |  FROM pos)
          |SELECT source, rank, doc_id, rel, n_tokens, global_start,
          |  start_block, end_block, spans_boundary,
          |  CAST(sum(n_tokens) OVER () AS BIGINT) AS shard_tokens,
          |  CAST(max(end_block) OVER () + 1 AS BIGINT) AS shard_blocks,
          |  CAST(sum(CASE WHEN spans_boundary THEN 1 ELSE 0 END)
          |    OVER () AS BIGINT) AS n_boundary
          |FROM fin
          |ORDER BY source, rank""".stripMargin
      }),

    // MEASURED LSH banding curve — q399 pins the ANALYTIC S-curve
    // P(cand | s) = 1 − (1 − s^r)^b; this gate measures its empirical
    // face on real data: the SAME k=32 unigram signatures banded
    // three ways — (4,8) strict, (8,4) mid, (16,2) the pipeline's
    // operating point — and each config's candidate set counted and
    // audited against the exact all-pairs Jaccard ≥ 0.8 truth (0.8,
    // not the pipeline's 0.9: the sample's ≥ 0.9 pairs are all caught
    // even by strict banding — the curve only bites on the
    // mid-similarity band the analytic S-curve predicts it misses).
    // More
    // bands = shorter band tuples = higher collision probability:
    // n_cands grows monotonically down the rows while recall climbs
    // to 1.0 — the artifact that justifies a (bands, rows) choice
    // before a 100 TB run pays for it. This is also the first gate to
    // hash-pin the CANDIDATE-set sizes (q30/q77 prove only the
    // verified output): the candidate count is the config's COST, and
    // cost is what the curve trades against recall. The oracle
    // replays signatures via the q28 permutation mins and candidates
    // via band-tuple equality (equivalent to the md5 band signature
    // on the non-null signatures this fixture guarantees — no empty
    // docs in the %20 sample at either SF).
    "q527_lsh_banding_curve" -> Q(
      (s, dir) => {
        val sample = Tables.documents(s, dir)
          .filter(col("doc_id") % 20 === 0)
        val sigs = Dedup.minhashSignaturesRow(sample, "doc_id",
          "text", 1, 32).localCheckpoint(true)
        val shingled = Dedup.shingleHashes(sample, "doc_id", "text", 1)
        val ids = sample.select(col("doc_id"))
        val allPairs = ids.select(col("doc_id").as("id_a"))
          .join(ids.select(col("doc_id").as("id_b")),
            col("id_a") < col("id_b"))
        val truth = Dedup.jaccard(allPairs, shingled, "doc_id")
          .filter(col("jaccard") >= 0.8)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
        Seq((4, 8), (8, 4), (16, 2)).map { case (b, r) =>
          val cands = Dedup.candidatePairs(
              Dedup.lshBuckets(sigs, "doc_id", b, r), "doc_id")
            .localCheckpoint(true)
          val hits = cands.join(truth, Seq("id_a", "id_b"),
            "left_semi").agg(count(lit(1)).as("hits"))
          truth.agg(count(lit(1)).as("n_true"))
            .crossJoin(cands.agg(count(lit(1)).as("n_cands")))
            .crossJoin(hits)
            .select(lit(b.toLong).as("bands"),
              lit(r.toLong).as("rows_per_band"),
              col("n_true"), col("n_cands"), col("hits"),
              floor(lit(1000000.0) * col("hits") /
                greatest(col("n_true"), lit(1L)))
                .cast("long").as("recall_ppm"))
        }.reduce(_.unionByName(_)).orderBy(col("bands"))
      },
      {
        val mins = Dedup.perms(32).zipWithIndex.map { case ((a, b), i) =>
          s"min((h * $a + $b) % ${Dedup.P}) AS m$i"
        }.mkString(",\n|    ")
        def candSql(b: Int, r: Int): String = {
          val bandEq = (0 until b).map { bi =>
            (0 until r).map(ri => {
              val m = bi * r + ri
              s"a.m$m = bb.m$m"
            }).mkString("(", " AND ", ")")
          }.mkString("\n|      OR ")
          s"""c$b AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a,
             |    bb.doc_id AS id_b
             |  FROM sg a JOIN sg bb ON a.doc_id < bb.doc_id
             |  WHERE $bandEq)""".stripMargin
        }
        def rowSql(b: Int, r: Int): String =
          s"""SELECT CAST($b AS BIGINT) AS bands,
             |  CAST($r AS BIGINT) AS rows_per_band,
             |  (SELECT count(*) FROM jp) AS n_true,
             |  (SELECT count(*) FROM c$b) AS n_cands,
             |  (SELECT count(*) FROM c$b c JOIN jp
             |     ON jp.id_a = c.id_a AND jp.id_b = c.id_b) AS hits,
             |  CAST(floor(1000000.0 * (SELECT count(*) FROM c$b c
             |      JOIN jp ON jp.id_a = c.id_a AND jp.id_b = c.id_b)
             |    / GREATEST((SELECT count(*) FROM jp), 1)) AS BIGINT)
             |    AS recall_ppm""".stripMargin
        Some(s"""WITH d8 AS (
          |  SELECT doc_id, list_distinct($normTokens) AS toks
          |  FROM documents WHERE doc_id % 20 = 0),
          |jp AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |      len(list_intersect(a.toks, b.toks))::DOUBLE /
          |        (len(a.toks) + len(b.toks)
          |          - len(list_intersect(a.toks, b.toks))) AS jaccard
          |    FROM d8 a JOIN d8 b ON a.doc_id < b.doc_id)
          |  WHERE jaccard >= 0.8),
          |tok AS (SELECT doc_id,
          |    CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
          |      ELSE string_split_regex(trim(lower(text)), '\\s+') END AS t
          |  FROM documents WHERE doc_id % 20 = 0),
          |sh AS (SELECT doc_id,
          |    unnest(CASE WHEN len(t) < 1 THEN [array_to_string(t, ' ')]
          |      ELSE t END) AS s
          |  FROM tok),
          |hh AS (SELECT doc_id,
          |    ${LlmQueries.h60sql("s")} % ${Dedup.P} AS h
          |  FROM sh),
          |sg AS MATERIALIZED (SELECT doc_id,
          |    $mins
          |  FROM hh GROUP BY doc_id),
          |${candSql(4, 8)},
          |${candSql(8, 4)},
          |${candSql(16, 2)}
          |SELECT * FROM (
          |${rowSql(4, 8)}
          |UNION ALL
          |${rowSql(8, 4)}
          |UNION ALL
          |${rowSql(16, 2)})
          |ORDER BY bands""".stripMargin)
      }),

    // CMS width → error MEASURED curve — the sketch family's tuning
    // artifact (q93 gates one operating point; this gate gates the
    // DIAL): the same d=4 token stream sketched at w = 8 / 32 / 128,
    // each width's estimates for the top-20 true counts aggregated
    // into total/max overestimate. CMS only overestimates (min over d
    // counters of colliding sums), and the collision mass shrinks
    // ∝ 1/w (ε ≈ e/w of the L1 mass) — the curve shows the measured
    // error collapsing as width grows, which is the memory/accuracy
    // decision a 100 TB frequency pass makes before it runs. Memory
    // is d·w counters regardless of stream size; width is the only
    // knob that buys accuracy.
    "q528_cms_width_curve" -> Q(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(lower(col("text"))))
            .as("t"))
          .localCheckpoint(true) // feeds 3 sketches + the vocab
        val vocab = toks.groupBy(col("t"))
          .agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("t")).limit(20)
          .localCheckpoint(true)
        Seq(8, 32, 128).map { w =>
          graft.operators.Sketch.estimate(
              graft.operators.Sketch.countMin(toks, col("t"), d = 4,
                w = w),
              vocab, col("t"), d = 4, w = w)
            .agg(count(lit(1)).as("n_tokens"),
              sum(col("true_cnt")).as("total_true"),
              sum(col("cms_est") - col("true_cnt")).as("total_over"),
              max(col("cms_est") - col("true_cnt")).as("max_over"))
            .select(lit(w.toLong).as("width"), col("n_tokens"),
              col("total_true"), col("total_over"), col("max_over"))
        }.reduce(_.unionByName(_)).orderBy(col("width"))
      },
      {
        val P = Dedup.P
        def rowsSql(src: String, extra: String, w: Int) =
          Dedup.perms(4).zipWithIndex.map { case ((a, b), i) =>
            s"SELECT $extra$i AS i, ((h * $a + $b) % $P) % $w AS bucket FROM $src"
          }.mkString("\n|    UNION ALL ")
        def blockSql(w: Int): String =
          s"""ctr$w AS (
             |  SELECT i, bucket, count(*) AS cnt FROM (
             |    ${rowsSql("h", "", w)})
             |  GROUP BY i, bucket),
             |pb$w AS (
             |    ${rowsSql("vh", "t, true_cnt, ", w)}),
             |es$w AS (SELECT pb$w.t, pb$w.true_cnt,
             |    min(coalesce(c.cnt, 0)) AS est
             |  FROM pb$w LEFT JOIN ctr$w c
             |    ON pb$w.i = c.i AND pb$w.bucket = c.bucket
             |  GROUP BY pb$w.t, pb$w.true_cnt)""".stripMargin
        def rowSql(w: Int): String =
          s"""SELECT CAST($w AS BIGINT) AS width,
             |  count(*) AS n_tokens,
             |  CAST(sum(true_cnt) AS BIGINT) AS total_true,
             |  CAST(sum(est - true_cnt) AS BIGINT) AS total_over,
             |  CAST(max(est - true_cnt) AS BIGINT) AS max_over
             |FROM es$w""".stripMargin
        Some(s"""WITH tok AS (SELECT unnest($tokensSql) AS t FROM documents),
          |h AS (SELECT t, ${h60sql("t")} % $P AS h FROM tok),
          |vocab AS (SELECT t, count(*) AS true_cnt FROM tok
          |  GROUP BY t ORDER BY true_cnt DESC, t LIMIT 20),
          |vh AS (SELECT t, true_cnt, ${h60sql("t")} % $P AS h
          |  FROM vocab),
          |${blockSql(8)},
          |${blockSql(32)},
          |${blockSql(128)}
          |SELECT * FROM (
          |${rowSql(8)}
          |UNION ALL
          |${rowSql(32)}
          |UNION ALL
          |${rowSql(128)})
          |ORDER BY width""".stripMargin)
      })
  )
}
