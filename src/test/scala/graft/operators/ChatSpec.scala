package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chat-template edges the corpus gate can't plant: non-consecutive
  * and duplicated turn indices, single-turn convs, span arithmetic on
  * a hand-checked rendering.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
    (2L, 0L, "user", "a"), (2L, 2L, "assistant", "b"),  // gap
    (3L, 0L, "user", "x"), (3L, 0L, "user", "x"),       // dup idx
    (4L, 0L, "assistant", "starts wrong"),
    (5L, 0L, "user", "only")
  ).toDF("conv", "idx", "role", "text")

  test("renderConversations: template, accounting, invariant flags") {
    val got = Chat.renderConversations(turns, "conv", "idx", "role",
        "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getString(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got(1L) === ((2L, true, "<|user|>hi<|assistant|>hello",
      2L, 5L)))
    assert(!got(2L)._2) // index gap
    assert(!got(3L)._2) // duplicated index
    assert(!got(4L)._2) // assistant first
    assert(got(5L) === ((1L, true, "<|user|>only", 4L, 0L)))
  }

  test("assistantSpans: offsets index the rendering exactly") {
    val spans = Chat.assistantSpans(turns.filter(col("conv") === 1),
        "conv", "idx", "role", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // rendered: <|user|>hi<|assistant|>hello — hello at [23, 28)
    assert(spans.toSeq === Seq((1L, 23L, 28L)))
    assert("<|user|>hi<|assistant|>hello".substring(23, 28) === "hello")
  }

  test("preferencePairs: tie-breaks, gap floor, degenerate groups") {
    val cands = Seq(
      (1L, 10L, 9L), (1L, 11L, 2L), (1L, 12L, 9L), // tie at top → id 10
      (2L, 20L, 5L), (2L, 21L, 5L),                // all tied → gap 0
      (3L, 30L, 7L)                                // single cand → gap 0
    ).toDF("prompt", "cand", "score")
    val got = Chat.preferencePairs(cands, "prompt", "cand", "score",
        minGap = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got === Map(1L -> ((10L, 9L, 11L, 2L, 7L))))
  }

  test("bradleyTerryPpm: strengths order by win rate, shutout hits 0") {
    import spark.implicits._
    // A beats B 3:1, both sweep C — expected strength A > B > C = 0
    val cmp = (Seq.fill(3)((1L, 2L)) ++ Seq((2L, 1L)) ++
      Seq.fill(2)((1L, 3L)) ++ Seq.fill(2)((2L, 3L)))
      .toDF("win", "lose")
    val got = Chat.bradleyTerryPpm(cmp, "win", "lose", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    assert(got(3L) === 0L) // never wins → MLE boundary in one step
    // round 1 hand-check for item 1: W=5, pairs n_12=4, n_13=2, all
    // w=1e6 → d = 4e12/2e6 + 2e12/2e6 = 3e6 → w' = 5e12/3e6
    val one = Chat.bradleyTerryPpm(cmp, "win", "lose", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(1L) === 5000000000000L / 3000000L)
  }
}
