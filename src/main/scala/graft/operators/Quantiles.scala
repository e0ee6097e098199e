package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantiles, twice: the exact full-sort baseline and the
  * fixed-bin histogram sketch that replaces the sort with one partial
  * agg — the same exact/approximate pairing as q31 (brute-force
  * cosine) vs q57 (IVF). Both pick EXISTING data values / fixed bin
  * edges rather than interpolating, so the gate compares selection,
  * not float interpolation arithmetic (the `percentile`/
  * `quantile_cont` interpolation formulas differ sub-ulp between
  * engines).
  */
object Quantiles {

  /** Quantile position: 1-based rank ceil(p·n) — the smallest value
    * with at least p·n values ≤ it (the classic discrete lower
    * quantile). p·n is one double multiply of a small literal by an
    * exact long — engine-stable.
    */
  private def qRank(p: Double, n: Column): Column =
    ceil(lit(p) * n).cast("long")

  /** Exact per-group quantiles by full per-group sort: row_number
    * over (group, value) + one grouped max(when(rn = ceil(p·n))).
    * Ties in `value` make row_number's choice among peers arbitrary
    * but the SELECTED VALUE deterministic — all peers hold the same
    * value, which is all the output exposes.
    *
    * One shuffle+sort over the fact grain: this is the exact
    * BASELINE. At 100 TB reach for histogramQuantiles (one bounded
    * partial agg) and keep this for the verification slice.
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val wSort = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
    val wAll = Window.partitionBy(col(keyCol))
    val ranked = df.select(col(keyCol), col(valCol))
      .withColumn("__rn", row_number().over(wSort))
      .withColumn("__n", count(lit(1)).over(wAll))
    val picks = ps.map { p =>
      max(when(col("__rn") === qRank(p, col("__n")), col(valCol)))
        .as(pCol(p))
    }
    ranked.groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"), picks: _*)
      // agg(first, rest*) puts n first; reorder key, n, p...
      .select(col(keyCol) +: col("n") +: ps.map(p => col(pCol(p))): _*)
  }

  /** Histogram-sketch quantiles: floor(value/binWidth) buckets the
    * fact scan into a (group × bin) grid — ONE partial agg, no sort
    * of the fact grain — then a cumulative count over the tiny grid
    * picks the first bin whose cumulative count reaches ceil(p·n).
    * Reported estimate = the bin's UPPER edge ((bin+1)·binWidth): a
    * deterministic value strictly above the true quantile, off by at
    * most binWidth (exactly binWidth when the quantile sits on a bin
    * lower edge).
    *
    * The grid is |groups| × |value-range/binWidth| rows — data-volume
    * independent, so the window pass over it is free at any scale.
    * This is the sketch HALF of the pair: bound the error by
    * binWidth, verify on a slice with exactQuantiles.
    */
  def histogramQuantiles(df: DataFrame, keyCol: String, valCol: String,
      binWidth: Double, ps: Seq[Double]): DataFrame = {
    require(binWidth > 0 && ps.nonEmpty && ps.forall(p => p > 0 && p <= 1))
    val grid = df
      .groupBy(col(keyCol),
        floor(col(valCol) / lit(binWidth)).cast("long").as("__bin"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
    val wAll = Window.partitionBy(col(keyCol))
    val cum = grid
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val picks = ps.map { p =>
      min(when(col("__cum") >= qRank(p, col("__n")),
        (col("__bin") + 1).cast("double") * lit(binWidth))).as(pCol(p) + "_est")
    }
    cum.groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"), picks: _*)
      .select(col(keyCol) +: col("n") +:
        ps.map(p => col(pCol(p) + "_est")): _*)
  }

  /** "p50" for 0.5, "p99" for 0.99 — column-name-safe, no dots. */
  private def pCol(p: Double): String =
    "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")
}
