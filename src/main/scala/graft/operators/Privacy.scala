package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing for corpus/gold-table release — the
  * governance pass a training-data pipeline runs before a dataset
  * leaves the boundary (the reference ships PII scrubbing and a
  * delegated-privileges gate; this is the table-shape complement:
  * re-identification risk of the rows themselves).
  *
  * k-anonymity: every released row must share its quasi-identifier
  * (QI) combination with ≥ k−1 other rows. l-diversity: within each
  * QI group the SENSITIVE attribute must take ≥ l distinct values
  * (a k-anonymous group whose members all share one sensitive value
  * still leaks it).
  *
  * Both are one QI-keyed partial aggregation over the table — the
  * same shuffle shape as any groupBy rollup, so the audit rides a
  * single scan at 100 TB. Suppression joins the (small) risky-group
  * frame back broadcast-style; the fact table is never shuffled for
  * it.
  */
object Privacy {

  /** Per-QI-group audit: group size, distinct sensitive values, and
    * the k-anonymous / l-diverse verdicts. Output grain is the QI
    * grid (bounded by the QI domain, not the row count).
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitive).as("n_sensitive"))
      .select(qiCols.map(col) ++ Seq(
        col("n"), col("n_sensitive"),
        (col("n") >= k).as("k_anon"),
        (col("n_sensitive") >= l).as("l_diverse")): _*)
  }

  /** Suppression pass: rows whose QI group fails k-anonymity get
    * their QI columns nulled (cell suppression), everything else
    * passes through unchanged. The risky-group frame is the audit
    * output filtered to failures — QI-domain-bounded, so the join
    * back onto the table broadcasts; the table itself never
    * shuffles.
    */
  def suppressSmallGroups(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, k: Int): DataFrame = {
    val risky = broadcast(
      kAnonymityAudit(df, qiCols, sensitive, k, l = 1)
        .filter(!col("k_anon"))
        .select(qiCols.map(c => col(c).as(s"__r_$c")): _*)
        .withColumn("__risky", lit(true)))
    val cond = qiCols.map(c => df(c) <=> risky(s"__r_$c")).reduce(_ && _)
    val kept = df.columns.map { c =>
      if (qiCols.contains(c))
        when(col("__risky"), lit(null)).otherwise(df(c)).as(c)
      else df(c).as(c)
    }
    df.join(risky, cond, "left")
      .select(kept.toIndexedSeq: _*)
  }

  /** k-anonymity by GLOBAL RECODING (Samarati 2001's full-domain
    * generalization — the release strategy [[suppressSmallGroups]]'s
    * cell suppression is the last resort of): the numeric
    * quasi-identifier `bandCol` (a NON-NEGATIVE integral band — shift
    * before calling; truncating and flooring division disagree on
    * negatives across engines) generalizes up a divisor hierarchy
    * (level i ⇒ band div divisors(i), coarser rightward), and the
    * table releases at the MINIMAL level where EVERY (qiCat ×
    * generalized-band) group reaches size k — one rule for the whole
    * table, so the released column stays analytically usable. If no
    * level suffices, the band suppresses to null (level =
    * divisors.size).
    *
    * All candidate levels are audited in ONE pass: rows explode ×
    * levels (levels are 3-4, not data-sized), one (level, QI) partial
    * agg, and only the levels-row min-count frame reaches the driver
    * to pick the level. Output: the input columns plus (gen_band,
    * gen_level).
    */
  def generalizeToK(df: DataFrame, qiCat: Seq[String], bandCol: String,
      divisors: Seq[Long], k: Int): DataFrame = {
    require(divisors.nonEmpty && divisors.forall(_ >= 1) && k >= 1)
    import graft.functions.FixedPoint.idiv
    def genAt(lev: Int): Column = idiv(col(bandCol), lit(divisors(lev)))
    val gv = divisors.indices.tail.foldLeft(
      when(col("__lev") === 0, genAt(0))) { (acc, i) =>
      acc.when(col("__lev") === i, genAt(i))
    }
    val minCounts = df
      .select((qiCat.map(col) :+ col(bandCol) :+
        explode(typedLit(divisors.indices.toList)).as("__lev")): _*)
      .withColumn("__gv", gv)
      .groupBy((col("__lev") +: qiCat.map(col) :+ col("__gv")): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("__lev"))
      .agg(min(col("__n")).as("__min_n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // forall: a level ABSENT from the audit frame means the input had
    // no rows at all (explode materializes every level otherwise), and
    // an empty table vacuously satisfies k-anonymity — release at the
    // finest level instead of throwing on the empty map
    val chosen = divisors.indices.find(i => minCounts.get(i).forall(_ >= k))
    chosen match {
      case Some(i) => df
        .withColumn("gen_band", genAt(i))
        .withColumn("gen_level", lit(i))
      case None => df
        .withColumn("gen_band", lit(null).cast("long"))
        .withColumn("gen_level", lit(divisors.size))
    }
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    * rung above l-diversity: a QI group leaks when its SENSITIVE
    * DISTRIBUTION diverges from the table-wide one, measured by the
    * Earth Mover's Distance over the ordered sensitive domain,
    *   EMD = (1/(m−1)) · Σ_bins |cumulative(p_group − p_global)|.
    * All shares are integer ppm (floor division) and the cumulative
    * walk is a window sum over the ordered bin axis, so the audit
    * hash-gates exactly.
    *
    * Output grain: the QI grid, with `n`, `emd_ppm`, and `t_close`
    * (EMD ≤ `tPpm`). Groups with a single-bin domain (m = 1) have
    * EMD 0 by definition.
    *
    * Scale: one (QI × sensitive) partial agg (grid-bounded), the
    * global distribution is a bin-count frame (broadcast), and the
    * per-group walk windows over the GRID, never the rows. Missing
    * bins are filled by a groups × domain join — both frames
    * dimension-sized.
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, tPpm: Long): DataFrame = {
    require(qiCols.nonEmpty && tPpm >= 0)
    import org.apache.spark.sql.expressions.Window
    val grid = df.groupBy(qiCols.map(col) :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val domain = grid.groupBy(col("__s")).agg(sum(col("__c")).as("__cs"))
    val totals = domain.agg(sum(col("__cs")).as("__nt"),
      count(lit(1)).as("__m"))
    // groups × full bin domain (both dimension-sized; the domain side
    // broadcasts), then the observed grid fills in — absent bins 0
    val full = groups
      .crossJoin(broadcast(domain.crossJoin(totals)))
      .join(grid, qiCols :+ "__s", "left")
    val w = Window.partitionBy(qiCols.map(col): _*).orderBy(col("__s"))
    full
      .withColumn("__diff",
        coalesce(expr("__c * 1000000L div n"), lit(0L)) -
          expr("__cs * 1000000L div __nt"))
      .withColumn("__cum", sum(col("__diff")).over(w))
      .groupBy(qiCols.map(col) :+ col("n") :+ col("__m"): _*)
      .agg(sum(abs(col("__cum"))).as("__semd"))
      .select(qiCols.map(col) ++ Seq(col("n"),
        when(col("__m") <= 1, lit(0L))
          .otherwise(expr("__semd div (__m - 1)")).as("emd_ppm")): _*)
      .withColumn("t_close", col("emd_ppm") <= tPpm)
  }

  /** The audit verdicts derived from a PRE-AGGREGATED
    * (qi..., sensitive, c) grid — algebraically identical to
    * [[kAnonymityAudit]] (n = Σc, n_sensitive = grid rows per QI),
    * factored out so a streaming-maintained Complete-mode grid (the
    * q206 histogram-state shape) feeds the same verdict logic as
    * batch: one rule definition, two execution modes. The grid is
    * (QI × sensitive)-bounded — dimension-sized state, never
    * row-sized.
    */
  def auditFromSensitiveGrid(grid: DataFrame, qiCols: Seq[String],
      countCol: String, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1 && l >= 1)
    grid.groupBy(qiCols.map(col): _*)
      .agg(sum(col(countCol)).as("n"),
        count(lit(1)).as("n_sensitive"))
      .select(qiCols.map(col) ++ Seq(
        col("n"), col("n_sensitive"),
        (col("n") >= k).as("k_anon"),
        (col("n_sensitive") >= l).as("l_diverse")): _*)
  }
}
