package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic star schema (TPC-H-ish) used by every query.
  *
  * All reads are plain parquet scans so Catalyst gets predicate pushdown,
  * column pruning and partition coalescing for free; callers `select`/
  * `filter` immediately after load so only the needed columns/row-groups
  * are read (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  *
  * At 100 TB these tables would be directory-partitioned (e.g. orders by
  * month, events by day); the loaders take a directory so the same code
  * path serves a partitioned layout — Spark prunes partitions from the
  * filter predicates without any change here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** The events parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long (legacy conf) and
    * convert to a microsecond TimestampType with integer division —
    * double division would lose precision at 1e18-nanosecond magnitudes.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Required at SESSION BUILD, not set here: a loader mutating
    // session conf as a side effect can race concurrent plans and
    // masks misconfigured sessions (every entry point — Verify, Bench,
    // ExplainAudit, SparkSpec — sets it in its builder).
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "events.parquet stores ts as TIMESTAMP(NANOS); set " +
        "spark.sql.legacy.parquet.nanosAsLong=true when building the " +
        "SparkSession")
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
