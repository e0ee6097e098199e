package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class ShingleHashesSpec extends SparkSpec {

  test("fused kernel equals the portable transform composition on corpus text") {
    val portable = transform(
      WordShingles.shinglesNative(col("text"), 3),
      s => Md5Hash60.hash60Native(s) % Dedup.P)
    val fused = ShingleHashes.shingleHashesNative(col("text"), 3, Dedup.P)
    val diffs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(portable.as("p"), fused.as("f"))
      .filter(not(col("p") <=> col("f")))
      .count()
    assert(diffs === 0)
  }

  test("edge values: empty string (whole-text shingle), unicode, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("héllo ∀ x"), Some("a b"), None).toDF("t")
    val got = df.select(
        transform(WordShingles.shinglesNative(col("t"), 3),
          s => Md5Hash60.hash60Native(s) % Dedup.P).as("p"),
        ShingleHashes.shingleHashesNative(col("t"), 3, Dedup.P).as("f"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    assert(got(3).isNullAt(1)) // null propagates
  }

  test("FuseShingleHashes rewrites the portable composition to the kernel") {
    // a parquet-backed frame: a literal one would constant-fold into
    // a LocalRelation before the plan can be inspected
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val portable = transform(
      WordShingles.shinglesNative(col("text"), 3),
      s => Md5Hash60.hash60Native(s) % Dedup.P)
    val df = docs.select(col("doc_id"), portable.as("h"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_shingle_hashes"),
      s"fusion rule did not fire:\n$optimized")
    assert(!optimized.contains("transform("),
      "portable ArrayTransform survived the rewrite")
    // and the rewritten plan still computes the right values
    val got = df.orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val direct = docs.select(col("doc_id"),
        ShingleHashes.shingleHashesNative(col("text"), 3, Dedup.P))
      .orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(got === direct)
  }

  test("agrees between codegen and interpreted paths") {
    import spark.implicits._
    val texts = Seq.tabulate(30)(i => s"tok$i " * (i % 7 + 1))
    val gen = texts.toDF("t")
      .select(ShingleHashes.shingleHashesNative(col("t"), 2, Dedup.P))
      .collect().map(_.getSeq[Long](0)).toSeq
    val interp = texts.map { t =>
      ShingleHashUtil.shingleHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 2,
        Dedup.P).toLongArray().toSeq
    }
    assert(gen === interp)
  }
}
