package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-6 batch: feature hashing, LOO target encoding, drift L1. */
class FeaturizerSpec extends SparkSpec {

  import spark.implicits._

  test("hashFeatures: counts collapse per bucket, deterministic") {
    val df = Seq((1L, "a b a"), (2L, ""), (3L, "a")).toDF("id", "text")
    val got = TextAnalysis.hashFeatures(df, "id", "text", dim = 16)
      .orderBy("id", "idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2 (empty) emits nothing; 'a' hashes identically everywhere
    assert(got.count(_._1 == 2L) === 0)
    val aIdx = got.filter(_._1 == 3L).head._2
    assert(got.contains((1L, aIdx, 2L)))
    assert(got.filter(_._1 == 1L).map(_._3).sum === 3L)
  }

  test("targetEncodeLoo: each row excluded from its own mean; singleton null") {
    val df = Seq(
      (1L, "x", 10L), (2L, "x", 20L), (3L, "x", 30L),
      (4L, "y", 7L))
      .toDF("id", "cat", "v")
    val got = Aggregates.targetEncodeLoo(df, "cat", "v", "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 25000L),  // (60-10)/2
      (2L, 20000L),  // (60-20)/2
      (3L, 15000L),  // (60-30)/2
      (4L, -1L)))    // singleton
  }

  test("binShareDrift: identical populations → zero L1; planted shift shows") {
    val a = Seq(50L, 150L, 250L).toDF("v")
    val same = QualityFilters.binShareDrift(a, a, "v", 100L)
    assert(same.select(max(col("l1_total_ppm"))).collect()
      .head.getLong(0) === 0L)
    val b = Seq(50L, 50L, 250L).toDF("v")
    val drift = QualityFilters.binShareDrift(a, b, "v", 100L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: bins 0,1,2 at 333333 each; b: bin0 666666, bin1 0, bin2 333333
    assert(drift.toSeq === Seq(
      (0L, 333333L, 666666L, 333333L),
      (1L, 333333L, 0L, 333333L),
      (2L, 333333L, 333333L, 0L)))
  }
}
