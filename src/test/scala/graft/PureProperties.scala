package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.expressions.{HashUtil, ShingleUtil}
import graft.functions.Text
import graft.operators.Qoe
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties over the pure (driver-side) functions —
  * invariants the golden tests can't enumerate (SURVEY §5.3).
  * Runs under `sbt test` via scalacheck's native sbt framework.
  */
object PureProperties extends Properties("graft.pure") {

  private val stateSeq: Gen[List[Int]] =
    Gen.listOf(Gen.chooseNum(0, 4))

  property("qoe.transitions: count positive iff timer positive, count <= timer") =
    forAll(stateSeq) { states =>
      val (count, timer) = Qoe.transitions(states.toIndexedSeq, 4, 2)
      (count == 0) == (timer == 0) && count <= timer
    }

  property("qoe.transitions: timer equals total length of to-runs preceded by from") =
    forAll(stateSeq) { states =>
      val s = states.toIndexedSeq
      val (_, timer) = Qoe.transitions(s, 4, 2)
      // independent run-length derivation of the same quantity
      var expect = 0
      var i = 0
      while (i < s.length) {
        if (s(i) == 2 && i > 0 && s(i - 1) != 2) {
          if (s(i - 1) == 4) {
            var j = i
            while (j < s.length && s(j) == 2) { expect += 1; j += 1 }
          }
        }
        i += 1
      }
      timer == expect
    }

  property("qoe.lowestQoe: bounded by min and max chunk potential") =
    forAll(stateSeq) { states =>
      val lo = Qoe.lowestQoe(states)
      lo >= 0.0 && lo <= 10.0 // 8 fours in a chunk = 80/8 = 10 max
    }

  property("qoe.dailyLinkOutages: blackout count <= total 0-samples") =
    forAll(stateSeq) { states =>
      val (_, _, blackouts, _, _) = Qoe.dailyLinkOutages(states.toIndexedSeq)
      blackouts <= states.count(_ == 0)
    }

  private val nameGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.oneOf(' ', '-', '_'),
      2 -> Gen.oneOf('#', '!', 'é', '|', '&', '\''))).map(_.mkString)

  // (validName is property-checked against the PRODUCTION Column form
  // in TextSpec's randomized comparison — a pure re-derivation here
  // would only test itself.)

  property("shingles: count is max(1, tokens - n + 1); each n-gram has n tokens") =
    forAll(Gen.listOf(Gen.identifier).map(_.mkString(" ")),
        Gen.chooseNum(1, 5)) { (text, n) =>
      val arr = ShingleUtil.shingles(UTF8String.fromString(text), n)
      val toks = text.trim.toLowerCase.split("\\s+").filter(_ => text.trim.nonEmpty)
      val expected = if (toks.length < n) 1 else toks.length - n + 1
      val sizesOk = (0 until arr.numElements()).forall { i =>
        val sh = arr.getUTF8String(i).toString
        toks.length < n || sh.split(" ").length == n
      }
      arr.numElements() == expected && sizesOk
    }

  property("md5h60: non-negative and below 2^60; deterministic") =
    forAll(Gen.asciiPrintableStr) { s =>
      val u = UTF8String.fromString(s)
      val h1 = HashUtil.md5h60(u)
      val h2 = HashUtil.md5h60(UTF8String.fromString(s))
      h1 >= 0L && h1 < (1L << 60) && h1 == h2
    }

  property("marketingNameScala: never empty string, never whitespace-only Invalid leak") =
    forAll(nameGen) { s =>
      val out = Text.marketingNameScala(s)
      out == null || out.nonEmpty
    }

  import graft.operators.Multimodal

  property("wav codec: decode inverts encode for ANY seed (JDK round trip)") =
    forAll(Gen.chooseNum(Long.MinValue / 64, Long.MaxValue / 64)) { seed =>
      val expected = (0 until 64).map(i =>
        Math.floorMod(seed * 31 + i * 7, 65536L) - 32768L)
      Multimodal.decodeWavStats(Multimodal.syntheticWav(seed)).contains(
        Multimodal.WavStats(8000L, 64L, expected.min, expected.max,
          expected.sum, expected.map(v => v * v).sum))
    }

  property("clip container: demux recovers every frame byte-exactly") =
    forAll(Gen.chooseNum(-1000000L, 1000000L), Gen.chooseNum(1, 6)) {
      (seed, nFrames) =>
        val frames = Multimodal.clipFrames(
          Multimodal.syntheticClip(seed, nFrames))
        frames.length == nFrames && frames.zipWithIndex.forall {
          case (f, i) =>
            java.util.Arrays.equals(f, Multimodal.syntheticPng(seed + i))
        }
    }

  private val hashList: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, graft.operators.Dedup.P - 1))

  property("oph signature: k values, each a bin-min or a borrowed bin-min") =
    forAll(hashList, Gen.chooseNum(1, 12)) { (hs, k) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        hs.toArray)
      val sig = graft.expressions.OnePermUtil.signature(arr, k)
      val vals = (0 until k).map(i =>
        if (sig.isNullAt(i)) None else Some(sig.getLong(i)))
      val binMins = hs.groupBy(h => (h % k).toInt)
        .map { case (b, v) => b -> v.min }
      if (hs.isEmpty) vals.forall(_.isEmpty)
      else vals.zipWithIndex.forall { case (v, i) =>
        // a filled bin reports its own min; an empty bin borrows the
        // next filled bin's min scanning right circularly
        binMins.get(i) match {
          case Some(m) => v.contains(m)
          case None =>
            val d = (1 until k).find(d => binMins.contains((i + d) % k))
            v == d.map(dd => binMins((i + dd) % k))
        }
      }
    }

  property("shingle hashes: fused kernel = shingle-then-hash composition") =
    forAll(Gen.alphaNumStr, Gen.chooseNum(1, 5)) { (s, n) =>
      val u = UTF8String.fromString(s)
      val fused = graft.expressions.ShingleHashUtil
        .shingleHashes(u, n, graft.operators.Dedup.P).toLongArray().toSeq
      val sh = ShingleUtil.shingles(u, n)
      val composed = (0 until sh.numElements()).map(i =>
        HashUtil.md5h60(sh.getUTF8String(i)) % graft.operators.Dedup.P)
      fused == composed
    }

  property("lsh curve powers: squaring chain floors within r*b ppm of real pow") =
    forAll(Gen.chooseNum(0L, 20L)) { step =>
      val s = step * 50000L
      def sq(x: Long, times: Int) =
        (1 to times).foldLeft(x)((a, _) => a * a / 1000000L)
      val sr = sq(s, 2)                       // s^4 at ppm scale
      val p = 1000000L - sq(1000000L - sr, 4) // 1-(1-s^4)^16
      val real = 1e6 * (1 - math.pow(1 - math.pow(s / 1e6, 4), 16))
      p >= 0 && p <= 1000000L && math.abs(p - real) <= 16 * 4 + 64
    }

  // Aho-Corasick vs the O(|dict|·|text|) definitional scan: a tiny
  // alphabet with overlapping multi-token symbols ("a", "ab", "b")
  // forces the fail-link paths a friendly alphabet never exercises.
  private val acTok: Gen[String] = Gen.oneOf("a", "b", "ab", "c", "B")
  private val acText: Gen[List[String]] = Gen.listOfN(12, acTok)
  private val acDict: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, acTok).map(_.mkString(" ")))).map(_.take(6))

  property("dictionaryMatches: automaton == definitional n-gram scan") =
    forAll(acText, acDict) { (toks, dict) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val expr = graft.expressions.DictionaryMatches(Literal("x"), dict)
      val got = {
        val a = expr.matchTokens(
          UTF8String.fromString(toks.mkString(" ")))
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
          .sorted
      }
      val low = toks.map(_.toLowerCase)
      val normDict = dict.map(_.toLowerCase.trim.split("\\s+")
          .filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty).distinct
      val expect = (for {
        p <- normDict
        i <- 0 to low.length - p.length
        if low.slice(i, i + p.length) == p
      } yield p.mkString(" ")).sorted
      got == expect
    }
}
