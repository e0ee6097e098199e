package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.FixedPoint
import graft.operators.{TextAnalysis, UnigramLm}

/** q449–q450: unigram-LM (SentencePiece-style) tokenizer training —
  * the third tokenizer family next to BPE train/encode (q107/q110)
  * and WordPiece greedy inference (q215). The oracle REPLAYS the full
  * hard-EM iteration in DuckDB: seed substring weights, the
  * fixed-point lnPpm scores (shift-and-square CTE kernel, prefixed
  * per stage), each round's Viterbi DP (one unrolled CTE stage per
  * word position, tie toward the longer piece), the backtrace as a
  * strictly-decreasing recursive CTE, the +1-smoothed piece recount,
  * and the (count desc, piece asc) prune — so every intermediate
  * table, not just the output, is pinned cross-engine.
  */
object TokenizerQueries extends QueryPack {

  private val MaxPieceLen = 3
  private val MaxWordLen = 8
  private val TopM = 24
  private val Rounds = 2

  /** Word vocabulary + seed pieces + round-0 scores. Mirrors
    * [[UnigramLm.seedPieces]]/[[UnigramLm.prunePieces]]/
    * the driver-side prune+rescore inside [[UnigramLm.train]].
    */
  private def headCtes: String =
    s"""tok AS (
       |  SELECT unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
       |                ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS word
       |  FROM documents),
       |w0 AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM tok
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen GROUP BY word),
       |lens AS (SELECT unnest(generate_series(1, $MaxPieceLen)) AS l),
       |sp0 AS (SELECT word, cnt,
       |    unnest(generate_series(1, length(word))) AS pos FROM w0),
       |sp1 AS (SELECT word, cnt, pos,
       |    unnest(generate_series(1, $MaxPieceLen)) AS l FROM sp0),
       |sw AS MATERIALIZED (
       |  SELECT substr(word, pos, l) AS piece, CAST(sum(cnt) AS BIGINT) AS w
       |  FROM sp1 WHERE pos + l - 1 <= length(word) GROUP BY 1),
       |${pruneCtes("sw", 0)}""".stripMargin

  /** Prune + rescore: singles ∪ top-M multis of `srcTable(piece, w)`,
    * then the lnPpm kernel (prefix `s$k`) → cost$k(piece, w, cost).
    */
  private def pruneCtes(srcTable: String, k: Int): String =
    s"""pr$k AS MATERIALIZED (
       |  SELECT piece, w FROM $srcTable WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, w FROM (
       |    SELECT piece, w, row_number() OVER (ORDER BY w DESC, piece) AS rn
       |    FROM $srcTable WHERE length(piece) > 1) WHERE rn <= $TopM),
       |tot$k AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM pr$k),
       |lsrc$k AS (SELECT piece AS key, (SELECT t FROM tot$k) AS num,
       |    w AS den FROM pr$k),
       |${FixedPoint.lnPpmSqlCtes(s"lsrc$k", s"s$k")},
       |cost$k AS MATERIALIZED (SELECT l.key AS piece, p.w, l.ln_ppm AS cost
       |  FROM s${k}lnppm l JOIN pr$k p ON p.piece = l.key)""".stripMargin

  /** Viterbi DP under cost$k: unrolled stages d${k}p1..d${k}p8 over
    * (word, pos, c, bl); ties (c asc, bl desc) = the Spark fold's
    * longer-piece-on-tie rule. Single-char coverage makes every
    * position reachable, so each stage emits exactly one row per
    * long-enough word.
    */
  private def dpCtes(k: Int): String = {
    val stages = (1 to MaxWordLen).map { p =>
      s"""d${k}p$p AS MATERIALIZED (
         |  SELECT * FROM d${k}p${p - 1}
         |  UNION ALL
         |  SELECT word, cnt, $p AS pos, c, bl FROM (
         |    SELECT word, cnt, c, bl,
         |      row_number() OVER (PARTITION BY word ORDER BY c, bl DESC) AS rn
         |    FROM (
         |      SELECT d.word, d.cnt, d.c + pc.cost AS c, ll.l AS bl
         |      FROM d${k}p${p - 1} d
         |      JOIN lens ll ON d.pos = $p - ll.l
         |      JOIN cost$k pc
         |        ON pc.piece = substr(d.word, $p - ll.l + 1, ll.l)
         |      WHERE length(d.word) >= $p))
         |  WHERE rn = 1)""".stripMargin
    }
    s"""d${k}p0 AS MATERIALIZED (SELECT word, cnt, 0 AS pos, CAST(0 AS BIGINT) AS c,
       |    0 AS bl FROM w0),
       |${stages.mkString(",\n")}""".stripMargin
  }

  /** Backtrace of dp$k: pieces of each word's best path, keyed by the
    * piece's END position (ascending = left to right). Strictly
    * decreasing `end_pos` terminates the recursion.
    */
  private def btCtes(k: Int): String =
    s"""bt$k AS (
       |  SELECT word, cnt, pos AS end_pos, bl,
       |    substr(word, pos - bl + 1, bl) AS piece, c
       |  FROM d${k}p$MaxWordLen WHERE pos = length(word)
       |  UNION ALL
       |  SELECT b.word, b.cnt, b.end_pos - b.bl AS end_pos, d.bl,
       |    substr(b.word, b.end_pos - b.bl - d.bl + 1, d.bl), b.c
       |  FROM bt$k b JOIN d${k}p$MaxWordLen d
       |    ON d.word = b.word AND d.pos = b.end_pos - b.bl
       |  WHERE b.end_pos - b.bl > 0)""".stripMargin

  /** One EM round: backtraced piece counts weighted by word count,
    * +1 smoothing over the CURRENT piece set, prune+rescore to
    * cost${k+1}.
    */
  private def emCtes(k: Int): String =
    s"""${dpCtes(k)},
       |${btCtes(k)},
       |uc$k AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS used
       |  FROM bt$k GROUP BY piece),
       |nw$k AS (SELECT c.piece, coalesce(u.used, 0) + 1 AS w
       |  FROM cost$k c LEFT JOIN uc$k u USING (piece)),
       |${pruneCtes(s"nw$k", k + 1)}""".stripMargin

  /** Shared Spark-side trainer invocation — ONE definition so q449
    * and q450 can never drift.
    */
  private def trained(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val words = Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .localCheckpoint(true)
    UnigramLm.train(words, "word", "cnt", rounds = Rounds,
      maxPieceLen = MaxPieceLen, maxWordLen = MaxWordLen, topM = TopM)
  }

  /** All CTEs through the final (round-`Rounds`) score table. */
  private def trainCtes: String =
    s"""$headCtes,
       |${(0 until Rounds).map(emCtes).mkString(",\n")}""".stripMargin

  private val JitterPpm = 12000000L

  /** Jittered Viterbi DP replay for [[UnigramLm.sampleSegment]]:
    * [[dpCtes]] with each piece occurrence's cost perturbed by the
    * salted 60-bit hash of (word, end position, piece, salt) mod
    * `JitterPpm` — the exact Spark-side perturb-and-MAP term.
    */
  private def dpSampleCtes(pfx: String, salt: String): String = {
    val stages = (1 to MaxWordLen).map { p =>
      val sub = s"substr(d.word, $p - ll.l + 1, ll.l)"
      val jit = s"CAST(('0x' || substr(md5(d.word || ':' || " +
        s"CAST($p AS VARCHAR) || ':' || $sub || ':' || '$salt'), " +
        s"1, 15)) AS BIGINT) % $JitterPpm"
      s"""${pfx}p$p AS MATERIALIZED (
         |  SELECT * FROM ${pfx}p${p - 1}
         |  UNION ALL
         |  SELECT word, cnt, $p AS pos, c, bl FROM (
         |    SELECT word, cnt, c, bl,
         |      row_number() OVER (PARTITION BY word ORDER BY c, bl DESC) AS rn
         |    FROM (
         |      SELECT d.word, d.cnt, d.c + pc.cost + $jit AS c, ll.l AS bl
         |      FROM ${pfx}p${p - 1} d
         |      JOIN lens ll ON d.pos = $p - ll.l
         |      JOIN cost$Rounds pc
         |        ON pc.piece = $sub
         |      WHERE length(d.word) >= $p))
         |  WHERE rn = 1)""".stripMargin
    }
    s"""${pfx}p0 AS MATERIALIZED (SELECT word, cnt, 0 AS pos,
       |    CAST(0 AS BIGINT) AS c, 0 AS bl FROM w0),
       |${stages.mkString(",\n")}""".stripMargin
  }

  /** [[btCtes]] over an arbitrary dp prefix. */
  private def btPfxCtes(bt: String, dpPfx: String): String =
    s"""$bt AS (
       |  SELECT word, cnt, pos AS end_pos, bl,
       |    substr(word, pos - bl + 1, bl) AS piece, c
       |  FROM ${dpPfx}p$MaxWordLen WHERE pos = length(word)
       |  UNION ALL
       |  SELECT b.word, b.cnt, b.end_pos - b.bl AS end_pos, d.bl,
       |    substr(b.word, b.end_pos - b.bl - d.bl + 1, d.bl), b.c
       |  FROM $bt b JOIN ${dpPfx}p$MaxWordLen d
       |    ON d.word = b.word AND d.pos = b.end_pos - b.bl
       |  WHERE b.end_pos - b.bl > 0)""".stripMargin

  /** Both sampled backtraces joined to true piece costs —
    * (word, cnt, salt, piece, end_pos, c_perturbed, tc).
    */
  private def sampledCtes: String =
    s"""${dpSampleCtes("j1d", "s1")},
       |${btPfxCtes("j1b", "j1d")},
       |${dpSampleCtes("j2d", "s2")},
       |${btPfxCtes("j2b", "j2d")},
       |su AS (
       |  SELECT word, cnt, 's1' AS salt, piece, end_pos, c FROM j1b
       |  UNION ALL
       |  SELECT word, cnt, 's2' AS salt, piece, end_pos, c FROM j2b),
       |sj AS (SELECT su.*, pc.cost AS tc
       |  FROM su JOIN cost$Rounds pc ON pc.piece = su.piece)""".stripMargin

  /** Spark-side sampled segmentations for both salts, one frame. */
  private def sampledBoth(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val (scored, segmented) = trained(s, dir)
    val costs = scored.collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    val words = segmented.select(col("word"), col("cnt"))
      .localCheckpoint(true)
    val both = Seq("s1", "s2").map { salt =>
      UnigramLm.sampleSegment(words, "word", costs, MaxPieceLen,
          MaxWordLen, salt, JitterPpm)
        .withColumn("salt", lit(salt))
    }.reduce(_ unionByName _)
    (segmented, both)
  }

  def defs: Map[String, Q] = Map(

    // Unigram-LM trainer, 2 hard-EM rounds: the final scored piece
    // table (piece, smoothed count, −ln p in ppm). The oracle replays
    // seed → score → (segment → recount → prune → rescore) × 2 with
    // every lnPpm bit-identical to the Spark fixed-point kernel.
    "q449_unigram_train" -> Q(
      (s, dir) => {
        val (scored, _) = trained(s, dir)
        scored.orderBy(col("piece"))
      },
      Some(s"""WITH RECURSIVE $trainCtes
        |SELECT piece, w, cost FROM cost$Rounds
        |ORDER BY piece""".stripMargin)),

    // Corpus-scale unigram ENCODE (tokenizer inference over
    // documents): per-doc token and piece counts via a broadcast
    // word→n_pieces join against the trained segmentation — q110's
    // shape; the per-occurrence DP never runs on the corpus. Words
    // longer than maxWordLen (excluded from training) fall back to
    // their character count, the q110 char-level discipline.
    "q456_unigram_encode" -> Q(
      (s, dir) => {
        val (_, segmented) = trained(s, dir)
        val docs = Tables.documents(s, dir)
        val pieces = segmented.select(col("word").as("__w"),
          col("n_pieces").as("__np"))
        val enc = docs
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("__w"))
          .join(broadcast(pieces), Seq("__w"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(coalesce(col("__np"),
              length(col("__w")).cast("long"))).as("n_pieces"))
        docs.select(col("doc_id")).join(enc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $trainCtes,
        |${dpCtes(Rounds)},
        |${btCtes(Rounds)},
        |np AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces
        |  FROM bt$Rounds GROUP BY word),
        |dtok AS (SELECT doc_id,
        |    unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS word
        |  FROM documents),
        |enc AS (SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(coalesce(np.n_pieces, length(d.word))) AS BIGINT)
        |      AS n_pieces
        |  FROM dtok d LEFT JOIN np ON np.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT doc.doc_id,
        |  coalesce(enc.n_tokens, 0) AS n_tokens,
        |  coalesce(enc.n_pieces, 0) AS n_pieces
        |FROM documents doc LEFT JOIN enc ON enc.doc_id = doc.doc_id
        |ORDER BY doc.doc_id""".stripMargin)),

    // Unigram-LM perplexity quality filter — the trained tokenizer
    // put to its pipeline use: each doc's tokens join the segmented
    // vocab (broadcast), the doc's total path cost (Σ −ln p, ppm) and
    // piece count roll up, and avg cost per piece gates a keep flag —
    // an exact-integer "bits per token" proxy, the perplexity filter
    // every corpus pipeline runs with a small LM. Words longer than
    // maxWordLen (excluded from training) are excluded from scoring
    // and counted separately.
    "q461_unigram_ppl_filter" -> Q(
      (s, dir) => {
        val (_, segmented) = trained(s, dir)
        val docs = Tables.documents(s, dir)
        val costs = segmented.select(col("word").as("__w"),
          col("n_pieces").as("__np"), col("cost").as("__c"))
        val enc = docs
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(lower(col("text")))).as("__w"))
          .join(broadcast(costs), Seq("__w"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("__np").isNull, 1L).otherwise(0L))
              .as("n_unscored"),
            coalesce(sum(col("__np")), lit(0L)).as("n_pieces"),
            coalesce(sum(col("__c")), lit(0L)).as("cost_ppm"))
        docs.select(col("doc_id")).join(enc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_unscored"), lit(0L)).as("n_unscored"),
            coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
            coalesce(col("cost_ppm"), lit(0L)).as("cost_ppm"))
          .withColumn("avg_piece_cost_ppm",
            when(col("n_pieces") === 0L, lit(0L))
              .otherwise(graft.functions.FixedPoint.idiv(
                col("cost_ppm"), col("n_pieces"))))
          .withColumn("keep", col("n_pieces") > 0L &&
            col("avg_piece_cost_ppm") <= 3500000L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $trainCtes,
        |${dpCtes(Rounds)},
        |${btCtes(Rounds)},
        |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces,
        |    min(c) AS cost
        |  FROM bt$Rounds GROUP BY word),
        |dtok AS (SELECT doc_id,
        |    unnest(CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS word
        |  FROM documents),
        |enc AS (SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN wc.word IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_unscored,
        |    CAST(coalesce(sum(wc.n_pieces), 0) AS BIGINT) AS n_pieces,
        |    CAST(coalesce(sum(wc.cost), 0) AS BIGINT) AS cost_ppm
        |  FROM dtok d LEFT JOIN wc ON wc.word = d.word
        |  GROUP BY d.doc_id)
        |SELECT doc.doc_id,
        |  coalesce(enc.n_tokens, 0) AS n_tokens,
        |  coalesce(enc.n_unscored, 0) AS n_unscored,
        |  coalesce(enc.n_pieces, 0) AS n_pieces,
        |  coalesce(enc.cost_ppm, 0) AS cost_ppm,
        |  CASE WHEN coalesce(enc.n_pieces, 0) = 0 THEN 0
        |    ELSE enc.cost_ppm // enc.n_pieces END AS avg_piece_cost_ppm,
        |  coalesce(enc.n_pieces, 0) > 0 AND (CASE
        |    WHEN coalesce(enc.n_pieces, 0) = 0 THEN 0
        |    ELSE enc.cost_ppm // enc.n_pieces END) <= 3500000 AS keep
        |FROM documents doc LEFT JOIN enc ON enc.doc_id = doc.doc_id
        |ORDER BY doc.doc_id""".stripMargin)),

    // Viterbi segmentation of the word vocabulary under the trained
    // scores — the inference path (corpus-scale encode is q456's
    // broadcast join away, q110's shape). Gates the chosen pieces,
    // their count, and the exact path cost per word.
    "q450_unigram_segment" -> Q(
      (s, dir) => {
        val (_, segmented) = trained(s, dir)
        segmented
          .select(col("word"), col("cnt"), col("n_pieces"), col("cost"),
            concat_ws("|", col("pieces")).as("seg"))
          .orderBy(col("word"))
      },
      Some(s"""WITH RECURSIVE $trainCtes,
        |${dpCtes(Rounds)},
        |${btCtes(Rounds)}
        |SELECT word, cnt, CAST(count(*) AS BIGINT) AS n_pieces,
        |  min(c) AS cost,
        |  string_agg(piece, '|' ORDER BY end_pos) AS seg
        |FROM bt$Rounds
        |GROUP BY word, cnt
        |ORDER BY word""".stripMargin)),

    // Subword REGULARIZATION (Kudo 2018 §3) as deterministic
    // perturb-and-MAP sampling: each piece occurrence's trained cost
    // is jittered by a salted hash of (word, position, piece, salt)
    // mod JitterPpm and the same Viterbi DP picks the min-perturbed
    // path — two salts give two independent segmentation samples per
    // word, each a pure function of (word, salt), so the sampled
    // paths (and their TRUE unperturbed costs) replay in SQL and
    // hash-gate. The missing tokenizer capability after train/encode
    // for all three families (VERDICT r10 item 5).
    "q466_unigram_sample" -> Q(
      (s, dir) => {
        val (_, both) = sampledBoth(s, dir)
        both.select(col("word"), col("cnt"), col("salt"),
            concat_ws("|", col("pieces")).as("seg"),
            col("n_pieces"), col("cost").as("cost_ppm"),
            col("cost_perturbed").as("cost_perturbed_ppm"))
          .orderBy(col("word"), col("salt"))
      },
      Some(s"""WITH RECURSIVE $trainCtes,
        |$sampledCtes
        |SELECT word, cnt, salt,
        |  string_agg(piece, '|' ORDER BY end_pos) AS seg,
        |  CAST(count(*) AS BIGINT) AS n_pieces,
        |  CAST(sum(tc) AS BIGINT) AS cost_ppm,
        |  min(c) AS cost_perturbed_ppm
        |FROM sj
        |GROUP BY word, cnt, salt
        |ORDER BY word, salt""".stripMargin)),

    // Expected-FERTILITY readout over the sampled segmentations:
    // token-weighted pieces-per-token (ppm) per salt next to the
    // 1-best baseline, plus how many vocabulary words each sample
    // actually re-segmented — the knob-calibration readout a
    // subword-regularization pipeline watches (too few changes ⇒
    // jitter too cold to augment; fertility blow-up ⇒ too hot).
    "q467_sample_fertility" -> Q(
      (s, dir) => {
        val (segmented, both) = sampledBoth(s, dir)
        val bestSeg = segmented.select(col("word"),
          concat_ws("|", col("pieces")).as("__bseg"))
        val best = segmented.select(lit("best").as("salt"), col("word"),
          col("cnt"), col("n_pieces"),
          concat_ws("|", col("pieces")).as("seg"))
        val sampled = both.select(col("salt"), col("word"), col("cnt"),
          col("n_pieces"), concat_ws("|", col("pieces")).as("seg"))
        best.unionByName(sampled)
          .join(broadcast(bestSeg), Seq("word"))
          .groupBy(col("salt"))
          .agg(count(lit(1)).as("n_words"),
            sum(when(col("seg") =!= col("__bseg"), 1L).otherwise(0L))
              .as("n_changed"),
            FixedPoint.idiv(sum(col("cnt") * col("n_pieces")) * 1000000L,
              sum(col("cnt"))).as("fertility_ppm"))
          .orderBy(col("salt"))
      },
      Some(s"""WITH RECURSIVE $trainCtes,
        |${dpCtes(Rounds)},
        |${btCtes(Rounds)},
        |$sampledCtes,
        |bst AS (SELECT word, string_agg(piece, '|' ORDER BY end_pos)
        |    AS bseg, CAST(count(*) AS BIGINT) AS bnp
        |  FROM bt$Rounds GROUP BY word),
        |aseg AS (
        |  SELECT b.word, w0.cnt, 'best' AS salt, b.bseg AS seg,
        |    b.bnp AS np
        |  FROM bst b JOIN w0 ON w0.word = b.word
        |  UNION ALL
        |  SELECT word, cnt, salt, string_agg(piece, '|' ORDER BY end_pos),
        |    CAST(count(*) AS BIGINT)
        |  FROM su GROUP BY word, cnt, salt)
        |SELECT a.salt, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(CASE WHEN a.seg <> b.bseg THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_changed,
        |  CAST(sum(a.cnt * a.np) AS BIGINT) * 1000000
        |    // CAST(sum(a.cnt) AS BIGINT) AS fertility_ppm
        |FROM aseg a JOIN bst b ON b.word = a.word
        |GROUP BY a.salt
        |ORDER BY a.salt""".stripMargin)),

    // EXACT n-best segmentation (VERDICT r11 item 7 — Kudo's lattice
    // n-best, the deterministic counterpart of q466's
    // perturb-and-MAP): top-3 lattice paths per vocabulary word under
    // the trained costs, exact path costs, ordered (cost asc, longer
    // piece first, predecessor rank) — a total order, so the whole
    // k-best DP replays in DuckDB as rank ≤ 3 windows per position
    // and a (pos, rank)-keyed recursive backtrace. Words with fewer
    // than 3 distinct segmentations emit fewer rows (the Inf-slot
    // filter on both sides).
    "q477_unigram_nbest" -> Q(
      (s, dir) => {
        val (scored, segmented) = trained(s, dir)
        val costs = scored.collect()
          .map(r => (r.getString(0), r.getLong(2))).toSeq
        val words = segmented.select(col("word"), col("cnt"))
          .localCheckpoint(true)
        UnigramLm.nbestSegment(words, "word", costs, MaxPieceLen,
            MaxWordLen, n = 3)
          .select(col("word"), col("cnt"), col("rank"),
            concat_ws("|", col("pieces")).as("seg"),
            col("n_pieces"), col("cost").as("cost_ppm"))
          .orderBy(col("word"), col("rank"))
      },
      {
        val kb = (1 to MaxWordLen).map { p =>
          s"""n3p$p AS MATERIALIZED (
             |  SELECT * FROM n3p${p - 1}
             |  UNION ALL
             |  SELECT word, cnt, $p AS pos, CAST(rn AS INT) AS rk, c, bl, pr
             |  FROM (
             |    SELECT word, cnt, c, bl, pr, row_number() OVER (
             |        PARTITION BY word ORDER BY c, bl DESC, pr) AS rn
             |    FROM (
             |      SELECT d.word, d.cnt, d.c + pc.cost AS c, ll.l AS bl,
             |        d.rk AS pr
             |      FROM n3p${p - 1} d
             |      JOIN lens ll ON d.pos = $p - ll.l
             |      JOIN cost$Rounds pc
             |        ON pc.piece = substr(d.word, $p - ll.l + 1, ll.l)
             |      WHERE length(d.word) >= $p))
             |  WHERE rn <= 3)""".stripMargin
        }.mkString(",\n")
        Some(s"""WITH RECURSIVE $trainCtes,
          |n3p0 AS (SELECT word, cnt, 0 AS pos, 1 AS rk,
          |    CAST(0 AS BIGINT) AS c, 0 AS bl, 0 AS pr FROM w0),
          |$kb,
          |nb AS (
          |  SELECT word, cnt, rk AS fr, c AS fcost, pos AS end_pos,
          |    bl, pr, substr(word, pos - bl + 1, bl) AS piece
          |  FROM n3p$MaxWordLen WHERE pos = length(word)
          |  UNION ALL
          |  SELECT b.word, b.cnt, b.fr, b.fcost,
          |    b.end_pos - b.bl AS end_pos, d.bl, d.pr,
          |    substr(b.word, b.end_pos - b.bl - d.bl + 1, d.bl)
          |  FROM nb b JOIN n3p$MaxWordLen d
          |    ON d.word = b.word AND d.pos = b.end_pos - b.bl
          |      AND d.rk = b.pr
          |  WHERE b.end_pos - b.bl > 0)
          |SELECT word, cnt, CAST(fr AS BIGINT) AS rank,
          |  string_agg(piece, '|' ORDER BY end_pos) AS seg,
          |  CAST(count(*) AS BIGINT) AS n_pieces,
          |  fcost AS cost_ppm
          |FROM nb
          |GROUP BY word, cnt, fr, fcost
          |ORDER BY word, rank""".stripMargin)
      })
  )
}
