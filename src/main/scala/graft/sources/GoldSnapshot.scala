package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S19: gold-table state reads for incremental refresh.
  *
  * The reference probes MySQL row-by-row for freshness
  * (`fun_mysql_query.py:17-112` — one SELECT per entity per flag).
  * The Spark restatement reads the gold table ONCE as a snapshot
  * frame and answers every probe with one anti-join
  * ([[graft.operators.Relational.staleOrMissing]]): at 100 TB the
  * snapshot read is a partitioned JDBC scan (`partitionColumn` +
  * bounds → one connection per partition), and the per-entity
  * round-trips disappear entirely.
  */
object GoldSnapshot {

  /** Plain snapshot read (small gold tables). */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new Properties())

  /** Partitioned snapshot read for big gold tables: `numPartitions`
    * parallel range scans over `partitionColumn` ∈ [lower, upper].
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper,
      numPartitions, new Properties())
}
