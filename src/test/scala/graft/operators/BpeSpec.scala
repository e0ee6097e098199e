package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-traced BPE merge rounds (q107 replays the same iteration in
  * the DuckDB oracle at corpus scale).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts weights by word count") {
    val vocab = Seq(("ab", 3L), ("abc", 2L)).toDF("word", "cnt")
      .withColumn("sym", Bpe.initSymbols(col("word")))
    val pc = Bpe.pairCounts(vocab, "sym", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pc == Map(("a", "b") -> 5L, ("b", "c") -> 2L))
  }

  test("bestPair tiebreak is count desc then lexicographic") {
    val vocab = Seq(("ba", 2L), ("ab", 2L)).toDF("word", "cnt")
      .withColumn("sym", Bpe.initSymbols(col("word")))
    // (a,b) and (b,a) both count 2 → lexicographic picks (a,b)
    assert(Bpe.bestPair(Bpe.pairCounts(vocab, "sym", "cnt"))
      .contains(("a", "b", 2L)))
  }

  test("merge is leftmost-greedy: 'aaa' merges once, 'abab' twice") {
    val vocab = Seq(("aaa", 1L), ("abab", 1L)).toDF("word", "cnt")
      .withColumn("sym", Bpe.initSymbols(col("word")))
    // round 1 best: (a,b) cnt 2 beats (a,a) 2? — (a,a): 'aaa' has
    // TWO adjacent (a,a) pairs; (a,b) from 'abab' has two; (b,a) one.
    // tie (a,a)=(a,b)=2 → lexicographic (a,a)
    val merged = Bpe.applyMerge(vocab, "sym", "a", "a")
      .select(col("word"), trim(regexp_replace(col("sym"), "\\s+", " ")))
      .as[(String, String)].collect().toMap
    // 'aaa': leftmost (a,a) merges, overlap does NOT re-merge
    assert(merged("aaa") == "aa a")
    assert(merged("abab") == "a b a b") // untouched
    val merged2 = Bpe.applyMerge(vocab, "sym", "a", "b")
      .select(col("word"), trim(regexp_replace(col("sym"), "\\s+", " ")))
      .as[(String, String)].collect().toMap
    // 'abab': BOTH disjoint (a,b) pairs merge in one pass
    assert(merged2("abab") == "ab ab")
  }

  test("train: 3 hand-checked rounds on a tiny vocabulary") {
    // vocab: low(5) lower(2) est(3)
    // r1 pairs: (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 (e,s)=3 (s,t)=3
    //   → tie 7/7, lexicographic: (l,o) → 'lo w', 'lo w e r', 'e s t'
    // r2: (lo,w)=7 (w,e)=2 (e,r)=2 (e,s)=3 (s,t)=3 → (lo,w)
    //   → 'low', 'low e r', 'e s t'
    // r3: (low,e)=2 (e,r)=2 (e,s)=3 (s,t)=3 → tie 3/3 → (e,s)
    val vocab = Seq(("low", 5L), ("lower", 2L), ("est", 3L))
      .toDF("word", "cnt")
    val (words, merges) = Bpe.train(vocab, "word", "cnt", rounds = 3)
    assert(merges == Seq(("l", "o", 7L), ("lo", "w", 7L), ("e", "s", 3L)))
    val sym = words
      .select(col("word"), trim(regexp_replace(col("sym"), "\\s+", " ")))
      .as[(String, String)].collect().toMap
    assert(sym("low") == "low")
    assert(sym("lower") == "low e r")
    assert(sym("est") == "es t")
  }

  test("train stops early when no pairs remain") {
    val vocab = Seq(("a", 4L), ("b", 2L)).toDF("word", "cnt")
    val (_, merges) = Bpe.train(vocab, "word", "cnt", rounds = 5)
    assert(merges.isEmpty)
  }
}
