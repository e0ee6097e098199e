package graft.operators

import graft.SparkSpec

/** Bucketing demonstration (SURVEY §4 / the co-located-join lever):
  * two tables bucketed on the join key join WITHOUT a shuffle — the
  * physical plan contains no Exchange on either side. At 100 TB this
  * is the difference between re-shuffling the fact table per join and
  * reading it pre-partitioned.
  */
class BucketedJoinSpec extends SparkSpec {

  test("joins between same-bucketed tables have no shuffle exchange") {
    import spark.implicits._
    // warehouse dir is a temp path set at session build (static conf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    (1 to 1000).map(i => (i.toLong % 97, s"o$i")).toDF("k", "o_payload")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("b_orders")
    (1 to 2000).map(i => (i.toLong % 97, i)).toDF("k", "l_payload")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("b_lines")

    val joined = spark.table("b_orders").join(spark.table("b_lines"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // and it still computes the right thing
    assert(joined.count() ===
      spark.table("b_orders").join(
        spark.table("b_lines").hint("shuffle_hash"), Seq("k")).count())
  }
}
