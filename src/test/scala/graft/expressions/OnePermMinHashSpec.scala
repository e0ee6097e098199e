package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

class OnePermMinHashSpec extends SparkSpec {

  /** Portable OPH: per-bin filter + array_min, then a coalesce chain
    * for the right-circular densification — the composition the
    * native expression must match bit-for-bit.
    */
  private def portable(k: Int) = {
    val bins = (0 until k).map(i =>
      array_min(filter(col("__h"), h => h % k === i)).as(s"b$i"))
    val dens = (0 until k).map { i =>
      coalesce((0 until k).map(d => col(s"b${(i + d) % k}")): _*)
        .as(s"m$i")
    }
    (bins, dens)
  }

  test("native OPH equals the portable filter/array_min/coalesce chain") {
    val hashes = transform(
      WordShingles.shinglesNative(col("text"), 3),
      s => Md5Hash60.hash60Native(s) % Dedup.P)
    val (bins, dens) = portable(8)
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), hashes.as("__h"))
    val p = d.select(col("doc_id") +: bins: _*)
      .select(col("doc_id") +: dens: _*)
    val n = d.select(col("doc_id"),
        OnePermMinHash.onePermNative(col("__h"), 8).as("s"))
      .select(col("doc_id") +: (0 until 8).map(i =>
        element_at(col("s"), i + 1).as(s"m$i")): _*)
    val cond = (0 until 8).map(i => p(s"m$i") <=> n(s"m$i"))
      .reduce(_ && _)
    assert(p.join(n, p("doc_id") === n("doc_id") && !cond).count() === 0)
  }

  test("densification borrows right-circularly; all-empty yields nulls") {
    import spark.implicits._
    // k=4: hashes {8, 5, 13} → bins 0:{8}, 1:{5,13}, 2:{}, 3:{}
    // bin 1 min = 5; bins 2,3 borrow circularly → bin 0's 8
    val df = Seq(Seq(8L, 5L, 13L)).toDF("__h")
    val got = df.select(OnePermMinHash.onePermNative(col("__h"), 4))
      .collect().head.getSeq[Any](0)
    assert(got === Seq(8L, 5L, 8L, 8L))
    val empty = Seq(Seq.empty[Long]).toDF("__h")
      .select(OnePermMinHash.onePermNative(col("__h"), 4))
      .collect().head.getSeq[Any](0)
    assert(empty === Seq(null, null, null, null))
    // null input propagates null
    val n = Seq(Option.empty[Seq[Long]]).toDF("__h")
      .select(OnePermMinHash.onePermNative(col("__h"), 4))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("negative elements bin via floorMod instead of throwing") {
    import spark.implicits._
    // out-of-contract negative hash: floorMod(-3, 4) = 1, so it
    // lands in bin 1 (and is that bin's min) — no AIOOBE
    val got = Seq(Seq(-3L, 8L, 5L)).toDF("__h")
      .select(OnePermMinHash.onePermNative(col("__h"), 4))
      .collect().head.getSeq[Any](0)
    assert(got === Seq(8L, -3L, 8L, 8L))
  }

  test("null elements are skipped, matching the portable filter drop") {
    import spark.implicits._
    // {8, null, 5, 13} must equal {8, 5, 13}: the portable
    // composition's filter drops the null (null % k is null), and
    // the kernel mirrors that instead of crashing on getLong
    val withNull = Seq(Seq(1L, 8L, 5L, 13L)).toDF("__h")
      .select(transform(col("__h"),
        h => when(h =!= 1L, h)).as("__hn")) // containsNull=true
    val got = withNull
      .select(OnePermMinHash.onePermNative(col("__hn"), 4))
      .collect().head.getSeq[Any](0)
    assert(got === Seq(8L, 5L, 8L, 8L))
  }

  test("agrees between codegen and interpreted paths") {
    val hs = Seq.tabulate(40)(i => Seq.tabulate(i)(j => (j * 977L + i) % Dedup.P))
    import spark.implicits._
    val gen = hs.toDF("__h")
      .select(OnePermMinHash.onePermNative(col("__h"), 8))
      .collect().map(_.getSeq[Any](0)).toSeq
    // compare non-empty rows element-wise (empty row checked above —
    // its all-null signature can't round-trip through toLongArray)
    hs.indices.filter(hs(_).nonEmpty).foreach { i =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        hs(i).toArray)
      assert(gen(i) === OnePermUtil.signature(arr, 8).toLongArray().toSeq)
    }
  }
}
