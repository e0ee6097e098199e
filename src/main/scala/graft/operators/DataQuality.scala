package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/Great
  * Expectations shape): a set of named table-level expectations —
  * completeness, uniqueness, value ranges, domain membership —
  * evaluated in ONE aggregation pass and returned long-format as
  * (check_idx, constraint, metric_ppm, pass).
  *
  * Every check contributes one plain COUNT-shaped aggregate to the
  * same partial-agg job, so the whole suite costs one table scan
  * regardless of how many constraints it carries — at 100 TB that is
  * one read, not one per check. Ratios are derived AFTER the agg with
  * integral `div` on BIGINT counts (never IEEE division), so the
  * readout is bit-identical across engines and overflow-safe to
  * ~9·10^12 rows (count·10^6 within Long range).
  */
object DataQuality {

  /** One named expectation: `raw` is an aggregate Column yielding a
    * BIGINT row count (satisfying rows / non-null rows / distinct
    * values); the check's metric is raw·10^6 div total and `minPpm`
    * is the acceptance floor on that ratio.
    */
  final case class Check(name: String, raw: Column, minPpm: Long)

  /** Non-null row count — completeness numerator. */
  def completeness(c: Column): Column = count(c)

  /** Distinct-value count — uniqueness (distinct/total) numerator.
    * Exact; swap for approx_count_distinct when a ±2% answer is
    * acceptable at extreme cardinality.
    */
  def uniqueRatio(c: Column): Column = count_distinct(c)

  /** Rows satisfying `pred`; null predicate counts as a violation
    * (data-quality semantics, not SQL three-valued logic).
    */
  def satisfiesRatio(pred: Column): Column = count(when(pred, 1))

  /** Evaluate the suite in one aggregation pass. Output: one row per
    * check, (check_idx BIGINT, constraint STRING, metric_ppm BIGINT,
    * pass BOOLEAN), in the caller's check order.
    */
  def checkAll(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggCols = checks.zipWithIndex.map { case (c, i) =>
      c.raw.cast("long").as(s"__m_$i")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val ppm = expr(s"__m_$i * 1000000L div greatest(__total, 1L)")
      struct(lit(i.toLong).as("check_idx"), lit(c.name).as("constraint_name"),
        ppm.as("metric_ppm"), (ppm >= c.minPpm).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_idx"), col("r.constraint_name"),
        col("r.metric_ppm"), col("r.pass"))
  }
}
