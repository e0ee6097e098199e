package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ChatQueries, CoreQueries, CrawlQueries, CrawlQueriesB, EvalLmQueries, GatewayQueries, MediaQueries, GoldQueries, GraphQueries, IndexQueries, IndexQueriesB, TemporalQueries, TimeSeriesQueries, LicenseQueries, LlmQueries, LlmQueriesB, NestedQueries, QoeQueries, QueryPack, ScalarQueries, ScaleQueries, SimilarityQueries, SinkQueries, SourceQueries, StreamingQueries, TokenizerQueries, GraphAnnQueries, ClusteredAnnQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY §2 is exposed as a named query over the
  * synthetic star schema in `sfDir`, paired (when SQL-expressible) with a
  * DuckDB oracle. Column names and row order are made deterministic in
  * BOTH formulations (exact decimal aggregation, total ORDER BY) so the
  * driver's hash compare is stable.
  *
  * SparkEntry is a thin aggregator over the query packs — the single
  * source of truth for each query/oracle pair lives in exactly one pack
  * (graft.queries.*).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(CoreQueries, WindowQueries, NestedQueries, QoeQueries, LlmQueries,
      LlmQueriesB,
      SimilarityQueries, LicenseQueries, ScalarQueries, GoldQueries,
      SinkQueries, GatewayQueries, StreamingQueries, SourceQueries,
      IndexQueries, IndexQueriesB, TemporalQueries, GraphQueries, AnalyticsQueries,
      TimeSeriesQueries, CrawlQueries, CrawlQueriesB, MediaQueries, ScaleQueries,
      ChatQueries, TokenizerQueries, GraphAnnQueries, ClusteredAnnQueries,
      EvalLmQueries)

  private lazy val all: Map[String, graft.queries.Q] =
    packs.foldLeft(Map.empty[String, graft.queries.Q]) { (acc, p) =>
      val dup = acc.keySet.intersect(p.defs.keySet)
      require(dup.isEmpty, s"duplicate query names across packs: $dup")
      acc ++ p.defs
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** Query names grouped by their defining pack, packs and names
    * sorted — the unit [[Bench]] forks one measurement JVM per
    * (VERDICT r11 item 1: per-query medians must track an idle JVM,
    * so no JVM measures more than one pack's worth of plans).
    */
  def packGroups: Seq[(String, Seq[String])] =
    packs.map(p => p.name -> p.defs.keys.toSeq.sorted)
      .sortBy(_._1)

  /** DuckDB-dialect oracles; column names/aliases match the Spark side.
    * Queries without an entry here get the driver's weaker rows-only
    * check (non-SQL-expressible ops: LSH bucketing, order-dependent
    * recurrences).
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
