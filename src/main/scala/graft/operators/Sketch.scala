package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a term stream — the sublinear heavy-hitter
  * summary for vocabularies too large to count exactly (the
  * training-corpus case: token/n-gram frequency at 100 TB where the
  * exact vocab would itself be TB-scale).
  *
  * Distributed-native shape: the sketch is a TALL frame (row, bucket,
  * cnt) produced by one partial-agg shuffle bounded by d×w counters —
  * never by vocabulary size; estimation is a broadcast join of the
  * (tiny) probe set against the counter frame.
  *
  * Deterministic end-to-end: term hashing is the md5-derived
  * [[TextAnalysis.hash60]] and the d pairwise hash rows reuse the
  * fixed-seed [[Dedup.perms]] constants, so the full counter table —
  * and therefore every estimate — is reproducible in the DuckDB
  * oracle (q93 interpolates the same constants).
  */
object Sketch {

  /** Build the d×w counter table: (row, bucket, cnt) with
    * cnt = number of term OCCURRENCES hashing to (row, bucket).
    */
  def countMin(df: DataFrame, termCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0)
    val h = TextAnalysis.hash60(termCol) % Dedup.P
    val buckets = array(Dedup.perms(d).map { case (a, b) =>
      ((h * a + b) % Dedup.P % w).cast("long")
    }: _*)
    df.select(posexplode(buckets).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("row", col("row").cast("long"))
  }

  /** Point estimates for a probe set: est(t) = min over the d rows of
    * the counter at (row, h_row(t) % w) — the classic CMS upper bound
    * (est ≥ true count; equality unless the term collides in every
    * row). `probes` must be small (the counter side is ≤ d×w rows and
    * is broadcast); returns the probe frame plus `cms_est`.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, termCol: Column,
      d: Int, w: Int): DataFrame = {
    val h = TextAnalysis.hash60(termCol) % Dedup.P
    val buckets = array(Dedup.perms(d).map { case (a, b) =>
      ((h * a + b) % Dedup.P % w).cast("long")
    }: _*)
    val pb = probes
      .select(probes.columns.map(col) :+
        posexplode(buckets).as(Seq("row", "bucket")): _*)
      .withColumn("row", col("row").cast("long"))
    pb.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      // a (row,bucket) the stream never touched has no counter row:
      // its count is 0, which min() must see
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
