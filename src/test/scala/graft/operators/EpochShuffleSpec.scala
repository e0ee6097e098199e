package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Epoch-shuffle invariants the q355 oracle can't see: exact
  * permutation coverage, seed determinism, and inter-seed
  * decorrelation.
  */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("permutation, determinism across runs, decorrelation across seeds") {
    val ids = (0L until 300L).toDF("id")
    def run(seed: String) =
      Corpus.epochShuffle(ids, "id", seed, shardSize = 32L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val a = run("s1")
    // positions are exactly 0..n-1, shards consistent with positions
    assert(a.values.map(_._1).toSeq.sorted === (0L until 300L))
    assert(a.values.forall { case (p, sh) => sh === p / 32 })
    // same seed → identical mapping on a fresh plan
    assert(run("s1") === a)
    // different seed → a different permutation (overwhelmingly), and
    // the hash order is not the identity order
    val b = run("s2")
    assert(a.toSeq.count { case (k, v) => b(k) == v } < 30)
    assert((0L until 300L).exists(i => a(i)._1 != i))
  }
}
