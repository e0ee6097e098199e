package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Instruction-tuning data preparation — the SFT half of a training
  * pipeline: turn tables become rendered conversations plus the
  * integrity facts and LOSS-MASK offsets a trainer needs. The
  * reference has no analog; the shapes follow the standard chat
  * template discipline (role markers concatenated in turn order,
  * assistant spans trainable, everything else masked).
  *
  * All pure integer/string algebra: rendering is a per-conversation
  * sort + join (ONE conv-keyed partial agg), spans are a conv-keyed
  * running sum — no driver state, no data-sized window.
  */
object Chat {

  val UserMark = "<|user|>"
  val AsstMark = "<|assistant|>"

  private def mark(roleCol: String) =
    when(col(roleCol) === "user", lit(UserMark)).otherwise(lit(AsstMark))

  /** Render one row per conversation: (conv, n_turns, alternation_ok,
    * rendered, user_chars, asst_chars). `alternation_ok` = turns are
    * 0-based consecutive AND strictly alternate starting with user —
    * the invariant SFT trainers assume; invalid conversations still
    * render (the caller filters on the flag).
    */
  def renderConversations(turns: DataFrame, convCol: String,
      idxCol: String, roleCol: String, textCol: String): DataFrame = {
    val piece = concat(mark(roleCol), col(textCol))
    val okTurn = (col(idxCol) % 2 === 0) === (col(roleCol) === "user")
    turns.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        (min(when(okTurn, 1L).otherwise(0L)) === 1 &&
          max(col(idxCol)) === count(lit(1)) - 1 &&
          countDistinct(col(idxCol)) === count(lit(1)))
          .as("alternation_ok"),
        array_join(transform(array_sort(collect_list(
            struct(col(idxCol), piece.as("__p")))),
          x => x.getField("__p")), "").as("rendered"),
        sum(when(col(roleCol) === "user", length(col(textCol))
          .cast("long")).otherwise(0L)).as("user_chars"),
        sum(when(col(roleCol) =!= "user", length(col(textCol))
          .cast("long")).otherwise(0L)).as("asst_chars"))
  }

  /** Loss-mask spans: for every ASSISTANT turn, the 0-based char
    * interval [span_start, span_end) its text occupies in the
    * [[renderConversations]] rendering (markers excluded — markers
    * are never trainable). One conv-keyed running sum over turn
    * lengths; the q359 gate proves the offsets by substring-extracting
    * the rendered text at them.
    */
  def assistantSpans(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val markLen = when(col(roleCol) === "user",
      lit(UserMark.length.toLong)).otherwise(lit(AsstMark.length.toLong))
    val pieceLen = markLen + length(col(textCol)).cast("long")
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    turns
      .withColumn("__before", coalesce(sum(pieceLen).over(w), lit(0L)))
      .withColumn("span_start", col("__before") + markLen)
      .withColumn("span_end",
        col("span_start") + length(col(textCol)).cast("long"))
      .filter(col(roleCol) =!= "user")
      .select(col(convCol), col(idxCol), col("span_start"),
        col("span_end"))
  }

  /** Preference-pair (DPO) construction: per prompt, chosen = the
    * highest-scored candidate, rejected = the lowest, both with ties
    * to the smallest candidate id; pairs below `minGap` are dropped
    * (no learning signal in a near-tie, and gap ≥ 1 also guarantees
    * chosen ≠ rejected). Two min-struct partial aggs — no window over
    * candidates, so prompt groups of any size stream through.
    */
  def preferencePairs(cands: DataFrame, promptCol: String,
      candCol: String, scoreCol: String, minGap: Long): DataFrame = {
    require(minGap >= 1, s"minGap must be >= 1, got $minGap")
    cands.groupBy(col(promptCol))
      .agg(
        min(struct((-col(scoreCol)).as("ns"), col(candCol).as("id")))
          .as("best"),
        min(struct(col(scoreCol).as("s"), col(candCol).as("id")))
          .as("worst"),
        count(lit(1)).as("n_cands"))
      .select(col(promptCol), col("n_cands"),
        col("best.id").as("chosen_id"),
        (-col("best.ns")).as("chosen_score"),
        col("worst.id").as("rejected_id"),
        col("worst.s").as("rejected_score"))
      .withColumn("gap", col("chosen_score") - col("rejected_score"))
      .filter(col("gap") >= minGap)
  }

  /** Bradley–Terry strength fitting from pairwise preferences by
    * Zermelo's MM iteration (Hunter 2004) — the model behind
    * reward-model data QA and chat-arena leaderboards: item i's
    * strength w_i satisfies P(i beats j) = w_i/(w_i+w_j), and each MM
    * round sets
    *   w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j)
    * (W_i = total wins, n_ij = comparisons of the unordered pair).
    *
    * Integer discipline ([[graft.operators.Graph.pageRankPpm]]):
    * strengths in ppm, per-pair terms floored at 10¹² scale, so
    * every round is order-free and the unrolled-CTE oracle replays
    * bit-exactly. The iteration is scale-invariant up to the floor;
    * no renormalization (callers compare ratios). Items that never
    * win fix at 0 — the MLE's boundary, reached in one step.
    *
    * Scale: comparisons collapse ONCE to (pair, count) and (item,
    * wins) — both item²-bounded, tiny for any leaderboard — then each
    * round is two item-keyed joins + one partial agg. Driver never
    * sees per-comparison data.
    */
  def bradleyTerryPpm(comparisons: DataFrame, winCol: String,
      loseCol: String, iters: Int): DataFrame = {
    require(iters >= 1)
    val cmp = comparisons.select(col(winCol).as("win"),
      col(loseCol).as("lose"))
    val items = cmp.select(col("win").as("item"))
      .union(cmp.select(col("lose").as("item"))).distinct()
    val winsAll = items
      .join(cmp.groupBy(col("win").as("item"))
        .agg(count(lit(1)).as("c")), Seq("item"), "left")
      .select(col("item"), coalesce(col("c"), lit(0L)).as("w_cnt"))
      .localCheckpoint()
    val pairs = cmp
      .select(least(col("win"), col("lose")).as("a"),
        greatest(col("win"), col("lose")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .localCheckpoint()
    var w = winsAll.select(col("item"), lit(1000000L).as("w_ppm"))
    for (_ <- 1 to iters) {
      val ab = pairs
        .join(w.select(col("item").as("a"), col("w_ppm").as("wa")), "a")
        .join(w.select(col("item").as("b"), col("w_ppm").as("wb")), "b")
        .withColumn("c",
          expr("(n_ab * 1000000000000L) div greatest(wa + wb, 1L)"))
      val denom = ab.select(col("a").as("item"), col("c"))
        .union(ab.select(col("b").as("item"), col("c")))
        .groupBy(col("item")).agg(sum(col("c")).as("d"))
      w = winsAll.join(denom, Seq("item"), "left")
        .select(col("item"),
          when(col("d").isNull || col("d") === 0, lit(0L))
            .otherwise(expr("(w_cnt * 1000000000000L) div d"))
            .as("w_ppm"))
        .localCheckpoint()
    }
    w
  }
}
