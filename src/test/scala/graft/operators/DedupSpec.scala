package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** LSH near-dup pipeline on planted fixtures: the approximate path has
  * no SQL oracle (q28/q29 gate the signature math instead), so recall
  * on known near-duplicates is asserted here.
  */
class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "sleeps near the warm fire and the birds sing in the tall green trees " +
      "above the quiet garden full of red and yellow flowers"
    val nearDup = base.replace("quick", "swift").replace("lazy", "idle")
    val unrelated1 = "spark executes distributed queries by splitting work " +
      "into stages and tasks that shuffle intermediate data between nodes " +
      "using hash partitioning and sort merge join algorithms at scale"
    val unrelated2 = "machine learning pipelines ingest billions of tokens " +
      "from web crawls filtering low quality pages and removing duplicated " +
      "content before tokenization and embedding generation begins"
    Seq(
      (1L, base), (2L, nearDup), (3L, unrelated1), (4L, unrelated2),
      (5L, base) // exact copy of 1
    ).toDF("doc_id", "text")
  }

  test("nearDupPairs finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)), "exact copy must be found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 5L)),
      "near-dup with 2 word substitutions must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exact copies have identical minhash signatures; unrelated differ") {
    val sh = Dedup.shingleHashes(corpus, "doc_id", "text", 3)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    assert(sigs(1L) === sigs(5L))
    assert(sigs(1L) !== sigs(3L))
    // near-dup shares most signature positions
    val shared = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(shared >= 8, s"near-dup shares only $shared/16 positions")
  }

  test("simhash: exact copies equal; near-dups within small hamming distance") {
    import spark.implicits._
    val sh = Dedup.simhash(corpus, "doc_id", "text", bits = 48)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 12,
      s"near-dup hamming ${ham(sh(1L), sh(2L))} too large")
    assert(ham(sh(1L), sh(3L)) > 12,
      s"unrelated hamming ${ham(sh(1L), sh(3L))} too small")
    // hamming Column form agrees
    val df = Seq((sh(1L), sh(2L))).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b")).as("h")).collect()
    assert(df.head.getInt(0) === ham(sh(1L), sh(2L)))
  }

  test("minhashSignaturesRow equals the groupBy formulation bit-for-bit") {
    val classic = Dedup.minhashSignatures(
        Dedup.shingleHashes(corpus, "doc_id", "text", 2, dedup = false),
        "doc_id", 16)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val row = Dedup.minhashSignaturesRow(corpus, "doc_id", "text", 2, 16)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(row.toSeq === classic.toSeq)
  }

  test("dedupGroups: transitive closure over planted component shapes") {
    import spark.implicits._
    // a 4-chain (label must travel the diameter), a star, a lone pair
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),           // chain 10-11-12-13
      (20L, 21L), (20L, 22L), (20L, 23L),           // star centered on 20
      (31L, 30L)                                    // pair (min on the right)
    ).toDF("id_a", "id_b")
    val got = Dedup.dedupGroups(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got === Map(
      10L -> (10L, 1), 11L -> (10L, 0), 12L -> (10L, 0), 13L -> (10L, 0),
      20L -> (20L, 1), 21L -> (20L, 0), 22L -> (20L, 0), 23L -> (20L, 0),
      30L -> (30L, 1), 31L -> (30L, 0)))
  }

  test("dedupGroups: random graphs match a reference union-find") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 3) {
      val nNodes = 40 + trial * 30
      val pairs = Seq.fill(nNodes) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        if (a < b) (a, b) else (b, a + 1) // allow self-ish skew, keep a!=b
      }.filter(p => p._1 != p._2)
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.dedupGroups(pairs.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("dedupGroups: empty pair set yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dedupGroups(empty).collect().isEmpty)
  }

  test("dedupGroupsLogRounds equals dedupGroups on planted shapes") {
    import spark.implicits._
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),           // chain
      (20L, 21L), (20L, 22L), (20L, 23L),           // star
      (31L, 30L)                                    // pair (min right)
    ).toDF("id_a", "id_b")
    val prop = Dedup.dedupGroups(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val star = Dedup.dedupGroupsLogRounds(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(star === prop)
  }

  test("dedupGroupsLogRounds: random graphs match a reference union-find") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 3) {
      val nNodes = 40 + trial * 30
      val pairs = Seq.fill(nNodes) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        if (a < b) (a, b) else (b, a + 1)
      }.filter(p => p._1 != p._2)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.dedupGroupsLogRounds(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("dedupGroupsLogRounds: empty pair set yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dedupGroupsLogRounds(empty).collect().isEmpty)
  }

  test("deep chain (diameter > 64): propagation fails, log-rounds solves") {
    import spark.implicits._
    // a 70-node path with the minimum at one end: min-label propagation
    // moves one hop per round, so the default 64-round budget is short
    val chain = (0L until 69L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val err = intercept[IllegalArgumentException] {
      Dedup.dedupGroups(chain).collect()
    }
    assert(err.getMessage.contains("did not converge"))
    // the star alternation halves root distance per round: converges
    // well inside its default 32 rounds and labels the whole chain 0
    val got = Dedup.dedupGroupsLogRounds(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length === 70)
    assert(got.forall(_._2 === 0L))
    assert(got.count(_._3 === 1) === 1)
  }

  test("winnowFingerprints matches a driver-side reference winnow") {
    import spark.implicits._
    def hash60(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
    def refWinnow(text: String, k: Int, w: Int): Set[(Long, Int)] = {
      val toks = text.toLowerCase.trim.split("\\s+", -1)
        .toSeq.filter(_ => text.trim.nonEmpty)
      val grams =
        if (toks.length < k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      val hs = grams.map(hash60).zipWithIndex
      (0 to math.max(0, hs.length - w)).map { i =>
        hs.slice(i, i + w).minBy { case (h, p) => (h, p) }
      }.toSet
    }
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "the the the the the the the"), // all-equal hashes: pos ties
      (3L, "x y"),                          // shorter than one window
      (4L, "p q r s p q r s p q r s")      // repeated content
    ).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getInt(2))).toSet
      }
    for ((id, text) <- Seq(1L -> "a b c d e f g h i j k l",
        2L -> "the the the the the the the", 3L -> "x y",
        4L -> "p q r s p q r s p q r s"))
      assert(got(id) === refWinnow(text, 3, 4), s"doc $id")
    // density: selected ≈ 2/(w+1) of grams, far below full shingling
    assert(got(1L).size < 10 && got(1L).size >= 2)
    // coverage guarantee: every full window contains a selected pos
    val sel1 = got(1L).map(_._2)
    for (i <- 0 to (10 - 4)) // doc1 has 10 grams, windows of 4
      assert(sel1.exists(p => p >= i && p < i + 4), s"window $i uncovered")
  }

  test("simhashNearDup equals the all-pairs Hamming predicate (pigeonhole)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iotaY kappaY"),
      (4L, "completely unrelated words that share nothing with the rest"),
      (5L, "numbers one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashNearDup(docs, "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference: every pair by exact Hamming, NO banding
    val sh = Dedup.simhash(docs, "doc_id", "text", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(got === want) // banding must lose NOTHING (maxHamming < bands)
    // the guardrail itself
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(docs, "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 4)
    }
  }

  test("hashNearDupPairs handles full 64-bit (negative Long) fingerprints") {
    import spark.implicits._
    // bit 63 set → negative Longs: an arithmetic shiftright would
    // sign-smear every high band's slice and over/under-match
    val base = 0x8000F000A0003000L // negative
    val fps = Seq(
      (1L, base),
      (2L, base ^ 0x3L),               // hamming 2 from 1 — pair
      (3L, base ^ (1L << 63)),         // hamming 1, sign flips — pair
      (4L, 0x7FFFFFFFFFFFFFFFL),       // far from everything
      (5L, -1L)                        // all bits set
    ).toDF("doc_id", "fp")
    val got = Dedup.hashNearDupPairs(fps, "doc_id", "fp",
        bits = 64, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val m = Map(1L -> base, 2L -> (base ^ 0x3L), 3L -> (base ^ (1L << 63)),
      4L -> 0x7FFFFFFFFFFFFFFFL, 5L -> -1L)
    val want = (for {
      a <- m.keys; b <- m.keys if a < b
      h = java.lang.Long.bitCount(m(a) ^ m(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(want.nonEmpty && got === want)
  }

  test("winnowNearDupCandidates pairs copies, drops boilerplate prints") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, shared + " unique one"),
      (2L, shared + " unique two"),   // near-copy of 1 — must pair
      (3L, "totally different words nothing in common here at all"),
      // 12 docs sharing ONLY a boilerplate sentence: its fingerprints
      // exceed maxDf and must not produce the 12-choose-2 pair blowup
      ) ++ (10L until 22L).map(i => (i, s"standard footer text row $i"))
    val out = Dedup.winnowNearDupCandidates(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, w = 4, maxDf = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)))
    // no pair involves doc 3, and the boilerplate block stays unpaired
    // except through its per-row distinct tails
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    val boiler = out.filter(p => p._1 >= 10L)
    assert(boiler.isEmpty,
      s"boilerplate fingerprints above maxDf must be dropped: $boiler")
  }

  test("exactDedup groups identical canonical forms") {
    val d = Dedup.exactDedup(corpus, "doc_id",
        TextAnalysis.fingerprint(col("text")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(d.length === 4) // 5 docs, one exact pair
    assert(d.contains((1L, 2L))) // keeper 1 with 2 copies
  }

  test("dropRepeatedSegments removes cross-doc boilerplate in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y u1 a foo bar"), // segs: "x y" | "u1 a" | "foo bar"
      (2L, "x y u2 b foo bar"),
      (3L, "x y u3 c"),
      (4L, "solo text only here")).toDF("doc_id", "text")
    // "x y" spans 3 docs (> maxDocs=2, boilerplate); "foo bar" spans 2
    val out = Dedup.dropRepeatedSegments(docs, "doc_id", "text",
        segTokens = 2, maxDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, "u1 a foo bar")))
    assert(out(2L) == ((3L, 1L, "u2 b foo bar")))
    assert(out(3L) == ((2L, 1L, "u3 c")))
    assert(out(4L) == ((2L, 0L, "solo text only here")))
  }

  test("dropRepeatedSegments: ragged tail and fully-dropped docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r"), // segs: "p q" | "r" (ragged tail keeps 1 token)
      (2L, "p q"),
      (3L, "p q")).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedSegments(docs, "doc_id", "text",
        segTokens = 2, maxDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, "r")))
    assert(out(2L) == ((1L, 1L, ""))) // every segment dropped ⇒ empty
    assert(out(3L) == ((1L, 1L, "")))
  }

  test("dropRepeatedSegments: empty docs survive; caller id name kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, ""), // zero segments — must still appear
      (3L, "   ")).toDF("media_id", "text")
    val out = Dedup.dropRepeatedSegments(docs, "media_id", "text",
      segTokens = 2, maxDocs = 5)
    assert(out.columns.head === "media_id") // idCol name preserved
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(m(1L) == ((2L, 0L, "a b c d")))
    assert(m(2L) == ((0L, 0L, "")))
    assert(m(3L) == ((0L, 0L, "")))
  }

  test("dupSpans flags shared >=L-token runs and coalesces overlaps") {
    import spark.implicits._
    // docs 1 and 2 share the 8-token run "one two three four five six
    // seven eight" (anchors at pos 0..3 for L=5 → one merged span of 8);
    // doc 3 is clean; doc 4 is too short for any L=5 anchor.
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, shared + " alpha beta gamma delta epsilon"),
      (2L, "zeta eta " + shared),
      (3L, "totally different words with no repeated runs at all here ok"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", spanTokens = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    assert(out(1L) == ((13L, 1L, 8L, 8L, 1000000L * 8 / 13)))
    assert(out(2L) == ((10L, 1L, 8L, 8L, 800000L)))
    assert(out(3L) == ((11L, 0L, 0L, 0L, 0L)))
    assert(out(4L) == ((2L, 0L, 0L, 0L, 0L)))
  }

  test("dupSpans splits non-touching runs into separate spans") {
    import spark.implicits._
    val runA = "a1 a2 a3 a4 a5"
    val runB = "b1 b2 b3 b4 b5"
    val docs = Seq(
      (1L, runA + " x y z w v u t s " + runB),
      (2L, runA + " completely other middle text here now " + runB))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", spanTokens = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 10L))) // two disjoint 5-token spans
    assert(out(2L) == ((2L, 10L)))
  }

  test("dupSpans matches a brute-force reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val vocab = ('a' to 'j').map(_.toString) // tiny vocab → many shared runs
    val L = 3
    val corpus = (0L until 40L).map { id =>
      id -> (0 until 4 + rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // brute force: anchor shingles shared by >= 2 docs, merged spans
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val anchors = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(L).zipWithIndex.filter(_._1.size == L)
        .map { case (g, p) => (g.mkString(" "), id, p) }
    }
    val shared = anchors.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = toks.map { case (id, ts) =>
      val pos = anchors.filter(a => a._2 == id && shared(a._1)).map(_._3).sorted
      // merge [p, p+L) windows that touch or overlap
      val spans = pos.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) => acc match {
          case (s, e) :: rest if p <= e => (s, math.max(e, p + L)) :: rest
          case _ => (p, p + L) :: acc
        }
      }
      id -> ((spans.size.toLong, spans.map(s => (s._2 - s._1).toLong).sum))
    }
    val got = Dedup.dupSpans(corpus.toDF("doc_id", "text"), "doc_id",
        "text", spanTokens = L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    expected.foreach { case (id, exp) =>
      assert(got(id) === exp, s"doc $id: '${corpus.toMap.apply(id)}'")
    }
  }

  test("incrementalNearDup: batch docs match corpus near-dups, novel stay") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different corpus text about spark physical plans"),
      (102L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // = 100
      (2L, "nothing like anything already indexed in this corpus at all"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text",
        shingleN = 1, k = 32, bands = 16, threshold = 0.8)
      .orderBy("doc_id").collect()
    // doc 1: exact text of corpus 100 → jaccard 1.0, matched, not novel
    assert(got(0).getLong(0) === 1L)
    assert(got(0).getLong(1) === 100L)
    assert(got(0).getDouble(2) === 1.0)
    assert(!got(0).getBoolean(3))
    // doc 2: nothing close → novel with null match
    assert(got(1).getLong(0) === 2L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(1).getBoolean(3))
    // corpus never pairs with itself: 100 vs 102 are near-dups but the
    // output has exactly one row per BATCH doc
    assert(got.length === 2)
  }

  test("prefixFilterJaccardJoin equals brute-force Jaccard on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val vocab = ('a' to 'h').map(_.toString) // tiny vocab → dense overlaps
    val corpus = (0L until 50L).map { id =>
      id -> (0 until 3 + rnd.nextInt(8))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val sets = corpus.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    for (tPct <- Seq(40, 60, 80)) {
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) intersect sets(b)).size
        union = (sets(a) union sets(b)).size
        if 100 * inter >= tPct * union
      } yield (a, b, inter.toLong)).toSet
      val got = Dedup.prefixFilterJaccardJoin(
          corpus.toDF("doc_id", "text"), "doc_id", "text", tPct)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"thresholdPct=$tPct")
    }
  }

  test("prefixFilterJaccardJoin: exact copies, empty docs, ppm readout") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // exact copy of 1
      (3L, "alpha beta gamma epsilon"), // jaccard 3/5 = 60%
      (4L, ""),                         // no token set — never pairs
      (5L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardJoin(docs, "doc_id", "text", 60)
      .orderBy("id_a", "id_b").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val exact = got.head
    assert(exact.getLong(2) === 4L && exact.getLong(5) === 1000000L)
    val near = got(1) // inter 3, union 5 → 600000 ppm
    assert(near.getLong(2) === 3L && near.getLong(5) === 600000L)
  }

  test("editDistanceJoin: band blocking is lossless at bucket edges") {
    import spark.implicits._
    // lengths 7 and 9 straddle the width-8 bucket boundary (buckets
    // 0 and 1) — the pair MUST still meet via the neighbor probe
    val docs = Seq(
      (1L, "abcdefg"),     // len 7, bucket 0
      (2L, "abcdefghi"),   // len 9, bucket 1, dist 2 from doc 1
      (3L, "abcdefghijk"), // len 11: dist 2 from doc 2; the length
                           // filter kills it vs doc 1 (diff 4)
      (4L, "zzzzzzzzz"),   // len 9, same bucket as 2, dist > 2
      (5L, null.asInstanceOf[String]), (6L, "")) // null ≡ empty: dist 0
      .toDF("id", "s")
    val got = Dedup.editDistanceJoin(docs, "id", "s", maxDist = 2,
        bandWidth = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    assert(got === Map((1L, 2L) -> 2L, (2L, 3L) -> 2L, (5L, 6L) -> 0L))

    // each qualifying pair appears exactly once (no neighbor-probe
    // double count)
    assert(got.size === 3)
    // bandWidth <= maxDist is ACCEPTED since exact-length blocking
    // (the parameter no longer drives the access path, ADVICE r15) —
    // and the wide-distance result is still complete and lossless
    val wide = Dedup.editDistanceJoin(docs, "id", "s", maxDist = 8,
        bandWidth = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    assert(wide === Map((1L, 2L) -> 2L, (1L, 3L) -> 4L, (2L, 3L) -> 2L,
      (1L, 5L) -> 7L, (1L, 6L) -> 7L, (5L, 6L) -> 0L))
  }

  test("removeDupSpans: owner keeps, foreign coverage unions, shorts pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),      // owner of the shared run
      (2L, "x a b c d e f y z"),    // shares "a b c d e" + "b c d e f"
                                    // → coverage 1..7 dropped
      (3L, "tiny doc"),             // < L tokens: untouched
      (4L, "a b c d e f g h"))      // exact dup → everything covered
      .toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", spanTokens = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(1L) === ((8L, 8L, 0L, "a b c d e f g h")))
    assert(got(2L) === ((9L, 3L, 6L, "x y z")))
    assert(got(3L) === ((2L, 2L, 0L, "tiny doc")))
    assert(got(4L) === ((8L, 0L, 8L, "")))
  }

  test("contentDefinedChunks: edit locality, coverage, global owner") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val base = (0 until 400).map(_ =>
      "abcdefgh".charAt(rnd.nextInt(8))).mkString
    val docs = Seq((1L, base), (2L, "XY" + base), (3L, base),
      (4L, "")).toDF("doc_id", "text")
    val rows = Dedup.contentDefinedChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getBoolean(5)))
    val byDoc = rows.groupBy(_._1)
    // chunks tile each doc exactly: offsets contiguous, lens sum to n
    for ((id, cs) <- byDoc) {
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 0L)
      sorted.toSeq.sliding(2).foreach {
        case Seq(x, y) => assert(x._3 + x._4 === y._3); case _ => ()
      }
    }
    assert(!byDoc.contains(4L)) // empty doc → no chunks
    // edit locality: the 2-char prefix insert disturbs only the first
    // chunk — every later boundary re-syncs on content
    val h1 = byDoc(1L).map(_._5).toSeq
    val h2 = byDoc(2L).map(_._5).toSet
    assert(h1.count(h2.contains) >= h1.size - 1)
    // exact dup doc 3: identical chunk sequence, none first (doc 1 owns)
    assert(byDoc(3L).map(c => (c._2, c._5)).toSet ===
      byDoc(1L).map(c => (c._2, c._5)).toSet)
    assert(byDoc(3L).forall(!_._6))
    assert(byDoc(1L).forall(_._6))
  }

  test("passJoinEditDistance ≡ band join on an adversarial corpus") {
    import spark.implicits._
    // deterministic corpus: hash-derived strings over a 4-letter
    // alphabet (collision-rich), planted 1/2-edit neighbors, repeated
    // strings, tiny strings (≤ k), empties, and a null
    def mk(seed: Int, len: Int): String =
      (0 until len).map { i =>
        "abcd".charAt(((seed * 31 + i * 7) % 97) % 4)
      }.mkString
    val baseRows = (0 until 60).map { i => (i.toLong, mk(i, 8 + i % 9)) }
    val planted = Seq(
      (100L, mk(3, 12)),                       // exact dup of id 3
      (101L, mk(3, 12).drop(1)),               // 1 deletion
      (102L, "x" + mk(3, 12).tail),            // 1 substitution
      (103L, mk(3, 12) + "yz"),                // 2 insertions
      (104L, mk(7, 14).updated(2, 'z').updated(9, 'z').toString),
      (200L, ""), (201L, "a"), (202L, "ab"),   // tiny bucket
      (203L, "ba"), (204L, null.asInstanceOf[String]))
    val docs = (baseRows ++ planted).toDF("id", "s")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val band = rows(Dedup.editDistanceJoin(docs, "id", "s", maxDist = 2,
      bandWidth = 8))
    val pass = rows(Dedup.passJoinEditDistance(docs, "id", "s",
      maxDist = 2))
    assert(pass === band)
    // sanity: the planted neighbors are actually in the result
    // (id 3's own string is mk(3, 11) — one char shorter than the
    // mk(3, 12) plant, so its distances run 1/2/2; the dist-2 "yz"
    // plant pairs with its dist-0 base 100, not with id 3)
    val pairs = pass.map(t => (t._1, t._2))
    assert(pairs.contains((3L, 100L)) && pairs.contains((3L, 101L)) &&
      pairs.contains((3L, 102L)))
    assert(pairs.contains((100L, 101L)) && pairs.contains((100L, 103L)))
    assert(pairs.contains((200L, 201L)) && pairs.contains((202L, 203L)))
    assert(pairs.contains((200L, 204L))) // null ≡ empty, dist 0
  }
}
