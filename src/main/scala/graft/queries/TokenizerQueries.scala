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
        |ORDER BY word""".stripMargin))
  )
}
