package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark formulation plus (when SQL-expressible)
  * its DuckDB oracle. Packs keep SparkEntry a thin aggregator.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def defs: Map[String, Q]
}
