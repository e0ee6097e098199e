package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-6 batch: Misra-Gries exact heavy hitters, weak-supervision
  * majority vote, deterministic bootstrap CI, HITS.
  */
class VoteSketchGraphSpec extends SparkSpec {

  import spark.implicits._

  test("mgHeavyHitters: exact >n/k set under adversarial partitioning") {
    // 100 a's, 60 b's, 40 c's, 100 singletons → n = 300.
    // k = 4 → threshold 75: only 'a' qualifies (100·4 > 300).
    val data = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++
      Seq.fill(40)("c") ++ (1 to 100).map(i => s"x$i")
    // adversarial layout: sorted so singletons cluster, then spread
    // across 7 partitions
    val df = data.sorted.toDF("t").repartition(7)
    val got = Sketch.mgHeavyHitters(df, col("t"), k = 4)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(("a", 100L)))
    // tighter k admits b too (60·6 > 300 fails; 60·5=300 not >; k=4
    // only a) — loosen to k=6: threshold 50 → a and b
    val got6 = Sketch.mgHeavyHitters(df, col("t"), k = 6)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    assert(got6 === Seq(("a", 100L), ("b", 60L)))
  }

  test("mgCandidates: superset of true heavy hitters, bounded size") {
    val data = Seq.fill(50)("hot") ++ (1 to 200).map(i => s"c$i")
    val df = data.toDF("t").repartition(3)
    val cands = Sketch.mgCandidates(df, col("t"), k = 5)
      .as[String].collect().toSet
    assert(cands.contains("hot")) // 50·5 > 250 → must survive
    assert(cands.size <= 3 * 4 + 1) // ≤ (k-1)·partitions
  }

  test("majorityVote: majority, tie→null, all-abstain→null") {
    val df = Seq(
      (1L, Some("k"), Some("k"), Some("d")), // 2-1 → k
      (2L, Some("k"), Some("d"), None),      // 1-1 tie → null
      (3L, None, None, None),                // all abstain → null
      (4L, None, Some("d"), None))           // 0-1 → d
      .toDF("id", "a", "b", "c")
    val (n, lab) = Classifier.majorityVote(
      Seq(col("a"), col("b"), col("c")))
    val got = df.select(col("id"), n.as("n"), lab.as("l"))
      .orderBy("id")
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, 3L, Some("k")), (2L, 2L, None),
      (3L, 0L, None), (4L, 1L, Some("d"))))
  }

  test("bootstrapMeanCI: deterministic, ordered bounds, exact point") {
    val df = (1L to 100L).map(i => (i, i * 10)).toDF("id", "v")
    val a = Corpus.bootstrapMeanCI(df, "id", "v", 16, "s1")
      .collect().head
    val b = Corpus.bootstrapMeanCI(df, "id", "v", 16, "s1")
      .collect().head
    assert(a === b) // pure function of (data, salt)
    // point = mean(10..1000) = 505 → 505000 milli, exactly
    assert(a.getLong(1) === 505000L)
    assert(a.getLong(2) <= a.getLong(3)) // lo ≤ hi
    assert(a.getLong(4) === 16L)
    // a different salt draws different resamples
    val c = Corpus.bootstrapMeanCI(df, "id", "v", 16, "s2")
      .collect().head
    assert(c.getLong(5) !== a.getLong(5))
  }

  test("hitsPpm: star graph — center is sole authority, leaves are hubs") {
    // edges: 1→0, 2→0, 3→0 (everyone cites node 0)
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("s", "d")
    val got = Graph.hitsPpm(e, "s", "d", iters = 2)
      .orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    // node 0: auth max (1e6), hub 0 (no out-edges);
    // leaves: auth 0, hub max (all tie at 1e6)
    assert(got === Seq(
      (0L, 1000000L, 0L),
      (1L, 0L, 1000000L), (2L, 0L, 1000000L), (3L, 0L, 1000000L)))
  }

  test("hitsPpm: two-level chain distinguishes hub quality") {
    // 10→{0,1}, 11→{0}: 10 cites both authorities, 11 only one.
    // Round 1: auth(0)=2e6→raw, auth(1)=1e6 → scaled 1e6 and 5e5;
    // hub(10)=1.5e6 raw, hub(11)=1e6 raw → scaled 1e6 and 666666.
    val e = Seq((10L, 0L), (10L, 1L), (11L, 0L)).toDF("s", "d")
    val got = Graph.hitsPpm(e, "s", "d", iters = 1)
      .orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 1000000L, 0L), (1L, 500000L, 0L),
      (10L, 0L, 1000000L), (11L, 0L, 666666L)))
  }
}
