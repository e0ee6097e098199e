package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {

  test("seedPieces weights every substring by word count") {
    import spark.implicits._
    val vocab = Seq(("ab", 3L), ("b", 2L)).toDF("word", "cnt")
    val got = UnigramLm.seedPieces(vocab, "word", "cnt", maxPieceLen = 2)
      .as[(String, Long)].collect().toMap
    // "ab"·3 → a:3, b:3, ab:3 ; "b"·2 → b:2
    assert(got === Map("a" -> 3L, "b" -> 5L, "ab" -> 3L))
  }

  test("prunePieces keeps every single char and the top-M multis") {
    import spark.implicits._
    val pieces = Seq(("a", 1L), ("z", 1L), ("ab", 9L), ("bc", 8L),
      ("cd", 7L)).toDF("piece", "w")
    val kept = UnigramLm.prunePieces(pieces, topM = 2)
      .select("piece").as[String].collect().toSet
    assert(kept === Set("a", "z", "ab", "bc"))
  }

  test("viterbiSegment picks the min-cost path, longer piece on ties") {
    import spark.implicits._
    val words = Seq("abc", "ab", "c").toDF("word")
    // cost(ab)+cost(c) = 12 < cost(a)+cost(bc) = 15 < singles 21
    val costs = Seq("a" -> 7L, "b" -> 8L, "c" -> 6L, "ab" -> 6L,
      "bc" -> 8L)
    val got = UnigramLm.viterbiSegment(words, "word", costs,
        maxPieceLen = 2, maxWordLen = 4)
      .select(col("word"), concat_ws("|", col("pieces")).as("seg"),
        col("n_pieces"), col("cost"))
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("abc") === (("ab|c", 2L, 12L)))
    assert(got("ab") === (("ab", 1L, 6L)))
    assert(got("c") === (("c", 1L, 6L)))
    // tie: cost(xy-as-singles)=cost(xy) → longer piece must win
    val tie = UnigramLm.viterbiSegment(Seq("xy").toDF("word"), "word",
        Seq("x" -> 5L, "y" -> 5L, "xy" -> 10L), 2, 4)
      .select(concat_ws("|", col("pieces"))).as[String].head()
    assert(tie === "xy")
  }

  test("viterbiSegment falls back to singles when no multi matches") {
    import spark.implicits._
    val got = UnigramLm.viterbiSegment(Seq("qqq").toDF("word"), "word",
        Seq("q" -> 3L, "ab" -> 1L), maxPieceLen = 2, maxWordLen = 3)
      .select(concat_ws("|", col("pieces")), col("cost"))
      .as[(String, Long)].head()
    assert(got === (("q|q|q", 9L)))
  }

  test("train runs EM rounds and returns coverage-complete vocab") {
    import spark.implicits._
    val words = Seq(("the", 10L), ("then", 4L), ("he", 6L), ("hen", 3L))
      .toDF("word", "cnt")
    val (scored, segmented) = UnigramLm.train(words, "word", "cnt",
      rounds = 2, maxPieceLen = 3, maxWordLen = 4, topM = 4)
    val pieces = scored.select("piece").as[String].collect().toSet
    // singles always survive
    assert(Set("t", "h", "e", "n").subsetOf(pieces))
    // multis capped at topM
    assert(pieces.count(_.length > 1) <= 4)
    // every word segments fully: pieces re-concatenate to the word
    val bad = segmented
      .filter(concat_ws("", col("pieces")) =!= col("word")).count()
    assert(bad === 0L)
    // costs are -ln(w/total) ≥ 0 and finite
    assert(scored.filter(col("cost") < 0L).count() === 0L)
  }

  test("sampleSegment: valid segmentations, true cost ≥ 1-best, deterministic per salt") {
    import spark.implicits._
    val words = Seq(("the", 10L), ("then", 4L), ("he", 6L), ("hen", 3L),
      ("thee", 2L)).toDF("word", "cnt")
    val (scored, segmented) = UnigramLm.train(words, "word", "cnt",
      rounds = 2, maxPieceLen = 3, maxWordLen = 4, topM = 4)
    val costs = scored.collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val bestCost = segmented.select(col("word"), col("cost"))
      .as[(String, Long)].collect().toMap
    def sample(salt: String, jitter: Long) =
      UnigramLm.sampleSegment(words, "word", costs, 3, 4, salt, jitter)
        .select(col("word"), concat_ws("|", col("pieces")).as("seg"),
          col("cost"), col("cost_perturbed"))
        .as[(String, String, Long, Long)].collect().toSeq.sortBy(_._1)
    val s1 = sample("s1", 5000000L)
    // every sampled path is a real segmentation of the word, and its
    // TRUE cost can never beat the Viterbi optimum
    s1.foreach { case (w, seg, c, _) =>
      assert(seg.replace("|", "") === w)
      assert(c >= bestCost(w), s"$w sampled below optimum")
    }
    // pure function of (word, salt): same salt replays bit-identically
    assert(sample("s1", 5000000L) === s1)
    // jitter of 1 ppm cannot flip any path: degenerates to the 1-best
    val cold = sample("x", 1L)
    cold.foreach { case (w, _, c, _) => assert(c === bestCost(w)) }
  }

  test("nbestSegment: rank 1 is the Viterbi path, costs nondecreasing, paths distinct and exact") {
    import spark.implicits._
    val words = Seq("abc", "ab", "a").toDF("word")
    val costs = Seq("a" -> 7L, "b" -> 8L, "c" -> 6L, "ab" -> 6L,
      "bc" -> 8L)
    val got = UnigramLm.nbestSegment(words, "word", costs,
        maxPieceLen = 2, maxWordLen = 4, n = 3)
      .select(col("word"), col("rank"),
        concat_ws("|", col("pieces")).as("seg"), col("cost"))
      .as[(String, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // "abc" lattice: ab|c=12, a|bc=15, a|b|c=21 — all three, in order
    assert(got("abc").map(g => (g._3, g._4)) ===
      Seq(("ab|c", 12L), ("a|bc", 15L), ("a|b|c", 21L)))
    // "ab": exactly two segmentations; "a": exactly one — Inf slots
    // are dropped, never emitted
    assert(got("ab").map(g => (g._3, g._4)) ===
      Seq(("ab", 6L), ("a|b", 15L)))
    assert(got("a").map(g => (g._3, g._4)) === Seq(("a", 7L)))
    // rank 1 ≡ viterbiSegment on every word
    val best = UnigramLm.viterbiSegment(words, "word", costs,
        maxPieceLen = 2, maxWordLen = 4)
      .select(col("word"), concat_ws("|", col("pieces")), col("cost"))
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (w, rows) =>
      assert((rows.head._3, rows.head._4) === best(w), w)
    }
  }

  test("lnPpmLong is bit-identical to the column lnPpm kernel") {
    import spark.implicits._
    val probes = Seq((1L, 1L), (2L, 1L), (3L, 2L), (1000L, 7L),
      (1000000L, 999999L), ((1L << 33) - 1L, 1L), (98765L, 43L))
    val fromCol = probes.toDF("num", "den")
      .select(graft.functions.FixedPoint.lnPpm(col("num"), col("den")))
      .as[Long].collect().toSeq
    val fromScala = probes.map { case (n, d) =>
      graft.functions.FixedPoint.lnPpmLong(n, d) }
    assert(fromCol === fromScala)
  }
}
