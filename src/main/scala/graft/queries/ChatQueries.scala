package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Chat, Corpus, TextAnalysis}

/** Instruction-tuning (SFT) data-prep gates: sentence-segmented
  * documents become alternating user/assistant conversations (with
  * planted alternation violations), rendered through the chat
  * template; loss-mask offsets are proven by substring extraction.
  */
object ChatQueries extends QueryPack {

  /** Shared turn synthesis: q329's punctuated sentences with roles
    * alternating by turn index; docs ≡ 0 mod 17 plant a double-user
    * violation at turn 1.
    */
  private def turnsDf(s: SparkSession, dir: String): DataFrame = {
    val punct = Tables.documents(s, dir).select(col("doc_id"),
      regexp_replace(coalesce(col("text"), lit("")),
        "((?:\\S+ ){4}\\S+) ", "$1. ").as("t"))
    TextAnalysis.sentences(punct, "doc_id", "t")
      .withColumn("role",
        when(col("doc_id") % 17 === 0 && col("sent_idx") === 1, "user")
          .otherwise(when(col("sent_idx") % 2 === 0, "user")
            .otherwise("assistant")))
  }

  /** DuckDB turn CTE chain mirroring [[turnsDf]] (reuses the q329
    * segmentation CTEs verbatim).
    */
  private val turnsCte: String =
    s"""pt AS (
       |  SELECT doc_id, regexp_replace(coalesce(text, ''),
       |    '((?:\\S+ ){4}\\S+) ', '\\1. ', 'g') AS t
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, generate_subscripts(l, 1) - 1 AS sent_idx,
       |    unnest(l) AS raw
       |  FROM (SELECT doc_id,
       |          regexp_extract_all(t, '${TextAnalysis.sentencePat}') AS l
       |        FROM pt)),
       |c AS (
       |  SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx,
       |    trim(regexp_replace(raw, '\\s+', ' ', 'g')) AS sentence
       |  FROM m),
       |t AS (
       |  SELECT doc_id, sent_idx, sentence,
       |    CASE WHEN doc_id % 17 = 0 AND sent_idx = 1 THEN 'user'
       |         WHEN sent_idx % 2 = 0 THEN 'user'
       |         ELSE 'assistant' END AS role
       |  FROM c WHERE length(sentence) > 0)""".stripMargin

  private val renderCte: String =
    """r AS (SELECT doc_id, count(*) AS n_turns,
      |    (min(CASE WHEN (sent_idx % 2 = 0) = (role = 'user')
      |              THEN 1 ELSE 0 END) = 1
      |     AND max(sent_idx) = count(*) - 1
      |     AND count(DISTINCT sent_idx) = count(*)) AS alternation_ok,
      |    string_agg(CASE WHEN role = 'user' THEN '<|user|>'
      |                    ELSE '<|assistant|>' END || sentence,
      |      '' ORDER BY sent_idx) AS rendered,
      |    CAST(sum(CASE WHEN role = 'user' THEN length(sentence)
      |             ELSE 0 END) AS BIGINT) AS user_chars,
      |    CAST(sum(CASE WHEN role <> 'user' THEN length(sentence)
      |             ELSE 0 END) AS BIGINT) AS asst_chars
      |  FROM t GROUP BY 1)""".stripMargin

  override def defs: Map[String, Q] = Map(

    // Conversation rendering + integrity: template concatenation in
    // turn order, per-role char accounting, and the alternation
    // invariant (the %17 docs must flag false).
    "q358_chat_render" -> Q(
      (s, dir) => Chat.renderConversations(turnsDf(s, dir), "doc_id",
          "sent_idx", "role", "sentence")
        .orderBy(col("doc_id")),
      Some(s"""WITH $turnsCte,
        |$renderCte
        |SELECT doc_id, n_turns, alternation_ok, rendered, user_chars,
        |  asst_chars
        |FROM r ORDER BY doc_id""".stripMargin)),

    // Loss-mask spans: assistant-turn [start, end) offsets in the
    // rendered text, PROVEN by substring-extracting the rendering at
    // the claimed offsets and comparing to the turn text.
    "q359_loss_mask_spans" -> Q(
      (s, dir) => {
        val turns = turnsDf(s, dir)
        val spans = Chat.assistantSpans(turns, "doc_id", "sent_idx",
          "role", "sentence")
        val rendered = Chat.renderConversations(turns, "doc_id",
            "sent_idx", "role", "sentence")
          .select(col("doc_id"), col("rendered"))
        spans
          .join(turns.select(col("doc_id"), col("sent_idx"),
            col("sentence")), Seq("doc_id", "sent_idx"))
          .join(rendered, Seq("doc_id"))
          .withColumn("extract_ok",
            expr("substring(rendered, span_start + 1, " +
              "span_end - span_start)") === col("sentence"))
          .select(col("doc_id"), col("sent_idx"), col("span_start"),
            col("span_end"), col("extract_ok"))
          .orderBy(col("doc_id"), col("sent_idx"))
      },
      Some(s"""WITH $turnsCte,
        |$renderCte,
        |sp AS (SELECT doc_id, sent_idx, role, sentence,
        |    coalesce(sum(CASE WHEN role = 'user' THEN 8 ELSE 13 END
        |        + length(sentence)) OVER (PARTITION BY doc_id
        |      ORDER BY sent_idx ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS before
        |  FROM t),
        |sp2 AS (SELECT doc_id, sent_idx,
        |    CAST(before + CASE WHEN role = 'user' THEN 8 ELSE 13 END
        |      AS BIGINT) AS span_start,
        |    CAST(before + CASE WHEN role = 'user' THEN 8 ELSE 13 END
        |      + length(sentence) AS BIGINT) AS span_end,
        |    sentence
        |  FROM sp WHERE role <> 'user')
        |SELECT s.doc_id, s.sent_idx, s.span_start, s.span_end,
        |  substr(r.rendered, CAST(s.span_start + 1 AS INT),
        |    CAST(s.span_end - s.span_start AS INT)) = s.sentence
        |    AS extract_ok
        |FROM sp2 s JOIN r USING (doc_id)
        |ORDER BY s.doc_id, s.sent_idx""".stripMargin)),

    // DPO preference pairs: 5-candidate prompt groups with an
    // integer quality proxy; chosen/rejected by score with id
    // tie-breaks, near-ties dropped by the gap floor. The oracle
    // resolves both argmaxes through rank windows — the min-struct
    // trick must agree with them on every tie.
    "q360_preference_pairs" -> Q(
      (s, dir) => {
        val cands = Tables.documents(s, dir).select(
          expr("doc_id div 5").as("prompt"), col("doc_id"),
          (col("n_chars") % 97).as("score"))
        Chat.preferencePairs(cands, "prompt", "doc_id", "score",
            minGap = 5L)
          .orderBy(col("prompt"))
      },
      Some("""WITH c AS (
        |  SELECT doc_id // 5 AS prompt, doc_id, n_chars % 97 AS score
        |  FROM documents),
        |best AS (SELECT prompt, doc_id AS chosen_id,
        |    score AS chosen_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prompt
        |      ORDER BY score DESC, doc_id) AS rk FROM c) WHERE rk = 1),
        |worst AS (SELECT prompt, doc_id AS rejected_id,
        |    score AS rejected_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prompt
        |      ORDER BY score ASC, doc_id) AS rk FROM c) WHERE rk = 1),
        |n AS (SELECT prompt, count(*) AS n_cands FROM c GROUP BY 1)
        |SELECT b.prompt, n.n_cands, b.chosen_id, b.chosen_score,
        |  w.rejected_id, w.rejected_score,
        |  b.chosen_score - w.rejected_score AS gap
        |FROM best b JOIN worst w USING (prompt) JOIN n USING (prompt)
        |WHERE b.chosen_score - w.rejected_score >= 5
        |ORDER BY prompt""".stripMargin)),

    // Best-of-n yield curve — the rejection-sampling ROI readout:
    // for n ∈ {1,2,4}, the corpus-mean best score among each
    // prompt's first n candidates (deterministic id order). The
    // diminishing-returns shape tells you when more samples stop
    // paying; exact integer ppm so it hash-gates.
    "q361_best_of_n" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ranked = Tables.documents(s, dir).select(
            expr("doc_id div 5").as("prompt"), col("doc_id"),
            (col("n_chars") % 97).as("score"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("prompt")).orderBy(col("doc_id")))
            .cast("long"))
        ranked.select(col("prompt"), col("score"), col("rk"),
            explode(array(lit(1L), lit(2L), lit(4L))).as("n"))
          .filter(col("rk") <= col("n"))
          .groupBy(col("n"), col("prompt"))
          .agg(max(col("score")).as("best"))
          .groupBy(col("n"))
          .agg(count(lit(1)).as("n_prompts"),
            sum(col("best")).as("sum_best"))
          .withColumn("mean_best_ppm",
            expr("(1000000 * sum_best) div n_prompts"))
          .orderBy(col("n"))
      },
      Some("""WITH c AS (
        |  SELECT doc_id // 5 AS prompt, doc_id, n_chars % 97 AS score
        |  FROM documents),
        |r AS (SELECT prompt, score, row_number() OVER (
        |    PARTITION BY prompt ORDER BY doc_id) AS rk FROM c),
        |x AS (SELECT n, prompt, max(score) AS best
        |      FROM r CROSS JOIN (SELECT unnest([1, 2, 4]) AS n)
        |      WHERE rk <= n GROUP BY 1, 2)
        |SELECT CAST(n AS BIGINT) AS n, count(*) AS n_prompts,
        |  CAST(sum(best) AS BIGINT) AS sum_best,
        |  (1000000 * CAST(sum(best) AS BIGINT)) // count(*)
        |    AS mean_best_ppm
        |FROM x GROUP BY 1 ORDER BY n""".stripMargin)),

    // Context-window batching for SFT: conversations packed in id
    // order into 4096-char training windows by CUMULATIVE rendered
    // length (greedy sequential layout — the offset-continuity
    // discipline of real packed pretraining shards), computed through
    // the distributed prefix sum, never a global window. batch_id and
    // in-batch offset both gate against the naive running sum.
    "q364_conversation_packing" -> Q(
      (s, dir) => {
        val convs = graft.operators.Chat.renderConversations(
            turnsDf(s, dir), "doc_id", "sent_idx", "role", "sentence")
          .select(col("doc_id"),
            length(col("rendered")).cast("long").as("render_len"))
        Corpus.prefixSum(convs, "doc_id", "render_len",
            bucketWidth = 32L)
          .withColumn("start_off", col("cum") - col("render_len"))
          .withColumn("batch_id", expr("start_off div 4096"))
          .withColumn("batch_off", expr("start_off % 4096"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $turnsCte,
        |$renderCte,
        |l AS (SELECT doc_id,
        |    CAST(length(rendered) AS BIGINT) AS render_len FROM r),
        |cs AS (SELECT doc_id, render_len,
        |    CAST(sum(render_len) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM l)
        |SELECT doc_id, render_len, cum,
        |  cum - render_len AS start_off,
        |  (cum - render_len) // 4096 AS batch_id,
        |  (cum - render_len) % 4096 AS batch_off
        |FROM cs ORDER BY doc_id""".stripMargin)),

    // Bradley–Terry strengths from pairwise preferences (Zermelo MM,
    // 3 rounds, integer ppm): 8 synthetic models compared via the
    // doc-derived schedule, lower index winning except a mod-3 upset
    // minority — so the fitted strengths recover the index order with
    // noise-squeezed gaps. Unrolled-CTE oracle replays the MM
    // iteration bit-exactly.
    "q378_bradley_terry" -> Q(
      (s, dir) => {
        val base = Tables.documents(s, dir).select(
          (col("doc_id") % 8).as("i"),
          (expr("doc_id div 8") % 8).as("j"), col("doc_id"))
          .filter(col("i") =!= col("j"))
        val cmp = base.select(
          when(col("doc_id") % 3 === 0, greatest(col("i"), col("j")))
            .otherwise(least(col("i"), col("j"))).as("win"),
          when(col("doc_id") % 3 === 0, least(col("i"), col("j")))
            .otherwise(greatest(col("i"), col("j"))).as("lose"))
        graft.operators.Chat.bradleyTerryPpm(cmp, "win", "lose",
            iters = 3)
          .orderBy(col("item"))
      },
      {
        val iterCtes = (1 to 3).map { i =>
          s"""d$i AS (SELECT item, CAST(sum(c) AS BIGINT) AS d FROM (
             |    SELECT pr.a AS item, (pr.n_ab * 1000000000000)
             |      // greatest(wa.w_ppm + wb.w_ppm, 1) AS c
             |    FROM pr JOIN w${i - 1} wa ON pr.a = wa.item
             |    JOIN w${i - 1} wb ON pr.b = wb.item
             |    UNION ALL
             |    SELECT pr.b, (pr.n_ab * 1000000000000)
             |      // greatest(wa.w_ppm + wb.w_ppm, 1)
             |    FROM pr JOIN w${i - 1} wa ON pr.a = wa.item
             |    JOIN w${i - 1} wb ON pr.b = wb.item)
             |  GROUP BY 1),
             |w$i AS (SELECT wn.item,
             |    CAST(CASE WHEN d.d IS NULL OR d.d = 0 THEN 0
             |      ELSE (wn.w_cnt * 1000000000000) // d.d END
             |      AS BIGINT) AS w_ppm
             |  FROM wn LEFT JOIN d$i d USING (item))""".stripMargin
        }.mkString(",\n")
        Some(s"""WITH cmp AS (
          |  SELECT CASE WHEN doc_id % 3 = 0 THEN greatest(i, j)
          |           ELSE least(i, j) END AS win,
          |         CASE WHEN doc_id % 3 = 0 THEN least(i, j)
          |           ELSE greatest(i, j) END AS lose
          |  FROM (SELECT doc_id % 8 AS i, (doc_id // 8) % 8 AS j,
          |          doc_id FROM documents)
          |  WHERE i <> j),
          |it AS (SELECT win AS item FROM cmp
          |       UNION SELECT lose FROM cmp),
          |wn AS (SELECT it.item,
          |    CAST(coalesce(w.c, 0) AS BIGINT) AS w_cnt
          |  FROM it LEFT JOIN (SELECT win AS item, count(*) AS c
          |    FROM cmp GROUP BY 1) w USING (item)),
          |pr AS (SELECT least(win, lose) AS a, greatest(win, lose) AS b,
          |    count(*) AS n_ab FROM cmp GROUP BY 1, 2),
          |w0 AS (SELECT item, CAST(1000000 AS BIGINT) AS w_ppm FROM it),
          |$iterCtes
          |SELECT item, w_ppm FROM w3 ORDER BY item""".stripMargin)
      })
  )
}
