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

  test("encodeByVocab honors a non-default word column name") {
    val vocab = Seq(("ab", 4L)).toDF("token", "freq")
    val (words, _) = Bpe.train(vocab, "token", "freq", rounds = 1)
    val out = Bpe.encodeByVocab(
        Seq((1L, "ab ab")).toDF("doc_id", "text"),
        "doc_id", "text", words, wordCol = "token")
      .collect().head
    assert((out.getLong(1), out.getLong(2)) === ((2L, 2L))) // 'ab' merged
  }

  test("encodeByVocab counts subwords via lookup; OOV falls back to chars") {
    // trained on {low, est}; doc contains the OOV word "xyz" (3 chars)
    val vocab = Seq(("low", 5L), ("est", 3L)).toDF("word", "cnt")
    val (words, _) = Bpe.train(vocab, "word", "cnt", rounds = 2)
    // 2 rounds on {low×5, est×3}: (l,o)=5 → 'lo w'; (lo,w)=5 → 'low'
    val docs = Seq((1L, "LOW est xyz"), (2L, "low low")).toDF("doc_id", "text")
    val out = Bpe.encodeByVocab(docs, "doc_id", "text", words)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: low→1 piece (case-folded), est→'es t'? no — 2 rounds only
    //   merged 'low'; est stays 'e s t' = 3 pieces; xyz OOV → 3 chars
    assert(out(1L) == ((3L, 7L)))
    assert(out(2L) == ((2L, 2L)))
  }

  test("charNgramVocab ranks substrings by weighted count, piece tiebreak") {
    import spark.implicits._
    val words = Seq(("ab", 10L), ("ba", 10L)).toDF("word", "cnt")
    // substrings: ab→{a,b,ab}, ba→{b,a,ba}; a and b weigh 20 each,
    // ab/ba weigh 10 each; ties break lexicographically
    val got = Bpe.charNgramVocab(words, "word", "cnt",
      maxPieceLen = 2, topM = 3)
    assert(got === Seq("a", "b", "ab"))
  }

  test("greedyEncode: longest-match-first, unk on miss, fixed step budget") {
    import spark.implicits._
    val words = Seq(("hello", 1L), ("hexq", 1L), ("", 1L))
      .toDF("word", "cnt")
    val vocab = Seq("he", "ll", "o", "h", "e")
    val got = Bpe.greedyEncode(words, "word", vocab, maxPieceLen = 4,
        steps = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("hello") === ((3L, 0L)))  // he | ll | o
    // hexq: he | e?no: after 'he' pos=3 → 'x' miss → unk, 'q' miss → unk
    assert(got("hexq") === ((1L, 2L)))
    assert(got("") === ((0L, 0L)))       // empty word: state never advances
  }

  test("greedyEncode prefers the longer piece over a greedy short start") {
    import spark.implicits._
    val words = Seq(Tuple2("abc", 1L)).toDF("word", "cnt")
    // both 'a' and 'abc' in vocab → longest-first takes 'abc' whole
    val got = Bpe.greedyEncode(words, "word", Seq("a", "b", "c", "abc"))
      .collect()(0)
    assert(got.getLong(2) === 1L && got.getLong(3) === 0L)
  }

  test("charNgramVocab ignores empty words instead of emitting '' pieces") {
    import spark.implicits._
    // sequence(1, 0) defaults to step -1 and yields [1, 0]; without
    // the length guard the pos=0 row survives the bounds filter at
    // l=1 and a cnt-weighted empty piece outranks every real one
    val words = Seq(("", 100L), ("ab", 1L)).toDF("word", "cnt")
    val got = Bpe.charNgramVocab(words, "word", "cnt",
      maxPieceLen = 2, topM = 10)
    assert(!got.contains(""))
    assert(got.toSet === Set("a", "b", "ab"))
  }

  test("greedyEncode rejects vocab pieces longer than maxPieceLen") {
    import spark.implicits._
    val words = Seq(Tuple2("abcde", 1L)).toDF("word", "cnt")
    // 'abcde' (len 5) can never match under maxPieceLen=4 — silent
    // degradation, so the operator must fail fast instead
    val e = intercept[IllegalArgumentException](
      Bpe.greedyEncode(words, "word", Seq("a", "abcde"), maxPieceLen = 4))
    assert(e.getMessage.contains("abcde"))
  }

  test("dropoutSymbolize: p=0 is the trained chain, p=1 the char split, samples replay") {
    import spark.implicits._
    val vocab = Seq(("aaab", 5L), ("aab", 3L), ("ab", 4L))
      .toDF("word", "cnt")
    val (trainedWords, merges) = Bpe.train(vocab, "word", "cnt", rounds = 2)
    val ms = merges.map(m => (m._1, m._2))
    def syms(drop: Long, salt: String): Map[String, String] =
      Bpe.dropoutSymbolize(vocab, "word", ms, salt, drop)
        .select(col("word"), trim(col("sym_drop")).as("s"))
        .as[(String, String)].collect().toMap
    // p = 0: never drops — identical to the trained symbolization
    val trained = trainedWords.select(col("word"), trim(col("sym")).as("s"))
      .as[(String, String)].collect().toMap
    assert(syms(0L, "any") === trained)
    // p = 1: every merge drops — back to one symbol per character
    assert(syms(1000000L, "any") ===
      Map("aaab" -> "a  a  a  b", "aab" -> "a  a  b", "ab" -> "a  b"))
    // a sample is a pure function of (word, salt): bit-identical replay
    val s1 = syms(500000L, "s1")
    assert(syms(500000L, "s1") === s1)
    // and every sampled symbolization re-concatenates to its word
    s1.foreach { case (w, s0) => assert(s0.replace(" ", "") === w) }
  }
}
