package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** License / usage / feature-set derivations (SURVEY A9–A14,
  * `update_license_and_link_usage`, `powerbi_main_fun.py:1924-2193`) —
  * the reference's densest analytic block, restated as pure Column
  * expressions (one groupBy upstream supplies the aggregates).
  */
object License {

  /** A9: the running weighted score recurrence
    * (`powerbi_main_fun.py:2048-2049`):
    * `Score = ((Score*n + s)*12.5)/(n+1)` folded over links in list
    * order. NOT algebraically an average — the 12.5 compounds per
    * step (closed form `12.5/N · Σ sᵢ·12.5^(N-i)`), so evaluation
    * order matters; the fold over a deterministically-sorted array
    * reproduces it exactly, with no UDF (higher-order `aggregate`
    * with a struct accumulator).
    */
  def runningWeightedScore(sortedScores: Column): Column =
    aggregate(
      sortedScores,
      struct(lit(0.0d).as("s"), lit(0).as("n")),
      (acc, x) => struct(
        (((acc.getField("s") * acc.getField("n")) + x) * lit(12.5d) /
          (acc.getField("n") + 1)).as("s"),
        (acc.getField("n") + 1).as("n")),
      acc => acc.getField("s"))

  /** A10: capped usage percentage
    * (`powerbi_main_fun.py:2066-2073`): bytes over a 5-day capacity,
    * 0 when the bandwidth denominator is 0 (the reference leaves the
    * initialized 0).
    */
  def usagePct(totalUsageBytes: Column, totalBandwidthBps: Column): Column =
    when(totalBandwidthBps > 0,
      least(lit(100.0d),
        (totalUsageBytes * 8).cast("double") /
          (totalBandwidthBps * 60 * 60 * 8 * 5).cast("double") * 100))
      .otherwise(lit(0.0d))

  /** A12: license tier from int-truncated top Mbps
    * (`powerbi_main_fun.py:2076-2090`): overlapping `if`s over
    * disjoint ranges, no else — the reference's License stays unbound
    * when the model is falsy and lic ≤ 30 (our explicit null,
    * SURVEY §7.4.7), and `int()` TRUNCATES the rounded Mbps.
    */
  def licenseTier(model: Column, licBandwidthMbps: Column): Column = {
    val lic = licBandwidthMbps
    val m = model
    when(lic <= 30 && m.isNotNull && m =!= "", concat(m, lit("_30M")))
      .when(lic > 30 && lic <= 50, concat(m, lit("_50M")))
      .when(lic > 50 && lic <= 100, concat(m, lit("_100M")))
      .when(lic > 100 && lic <= 200, concat(m, lit("_200M")))
      .when(lic > 200 && lic <= 400, concat(m, lit("_400M")))
      .when(lic > 400 && lic <= 1000, concat(m, lit("_1G")))
      .when(lic > 1000, concat(m, lit("_5G")))
  }

  /** A13: per-model overcapacity thresholds
    * (`powerbi_main_fun.py:2092-2165`). Each threshold applies to
    * CONNECTED edges whose model CONTAINS the pattern; hubs alert
    * unconditionally, non-hubs only when either usage side exceeds
    * 5 %. Emits the exact event name or null (no alert).
    */
  def overcapacityEvent(model: Column, licMbps: Column, connected: Column,
      isHub: Column, uplinkPct: Column, downlinkPct: Column): Column = {
    val cases = Seq(
      (Seq("edge520", "edge510", "edge500"), 200),
      (Seq("edge610"), 350),
      (Seq("edge540"), 1000),
      (Seq("edge620"), 1500),
      (Seq("edge840"), 2000))
    cases.foldLeft(lit(null).cast("string")) { case (acc, (pats, thr)) =>
      val matches = pats.map(p => model.contains(p)).reduce(_ || _)
      val fires = licMbps > thr && connected && matches
      when(fires && isHub,
          concat(lit("OVERCAPACITY_HUB "), model, lit(s" over $thr")))
        .when(fires && (downlinkPct > 5 || uplinkPct > 5),
          concat(lit("OVERCAPACITY_HIGHUSAGE "), model, lit(s" over $thr")))
        .otherwise(acc)
    }
  }

  /** A14 tail: the feature-set elif chain
    * (`powerbi_main_fun.py:2026-2035`) — any gateway-path flag ⇒
    * Premium.
    */
  def featureSet(b2bViaGw: Column, pbViaGw: Column, cssViaGw: Column,
      nvsViaGw: Column): Column =
    when(b2bViaGw || pbViaGw || cssViaGw || nvsViaGw,
      lit("Premium Subscription")).otherwise(lit("Enterprise Subscription"))

  /** A14 level fallback (`powerbi_main_fun.py:1999-2003,2018-2022`):
    * profile-level flags are consulted only when ALL edge-level
    * pb/css/nvs flags are false — value-based fallback, not null
    * coalescing.
    */
  def levelFallback(edgeFlags: (Column, Column, Column),
      profileFlags: (Column, Column, Column)): (Column, Column, Column) = {
    val (ePb, eCss, eNvs) = edgeFlags
    val (pPb, pCss, pNvs) = profileFlags
    val useProfile = !ePb && !eCss && !eNvs
    (when(useProfile, pPb).otherwise(ePb),
     when(useProfile, pCss).otherwise(eCss),
     when(useProfile, pNvs).otherwise(eNvs))
  }
}
