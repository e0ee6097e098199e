package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel joins Spark lacks as built-ins, in their
  * shuffle-scalable formulations (SURVEY §2.4 records that the
  * reference contains none; a training-data pipeline wants both:
  * "join each event to the latest snapshot at-or-before it", and
  * "attribute each point to its containing interval").
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the single right
    * row with the same key and the greatest rightTime ≤ leftTime
    * (rows with no predecessor keep nulls).
    *
    * NOT the naive plan (join on key, filter, per-pair argmax — which
    * amplifies by the right-rows-per-key factor before pruning): both
    * sides UNION into one (key, time)-sorted stream and a single
    * window pass carries the latest right payload forward — one
    * shuffle on the key, a sort within partitions, zero row
    * amplification. The streaming-merge formulation of as-of.
    *
    * Right rows sort BEFORE left rows at equal timestamps, so a left
    * row at t sees a right row at exactly t (inclusive ≤); two right
    * rows tying on (key, time) are broken by the payload struct's
    * ordering (largest wins) so the result never depends on shuffle
    * placement. `payload` names the right columns to attach; they
    * must not collide with left column names. The matched right time
    * arrives as `asof_time` (null when unmatched). Times must cast
    * to long.
    */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val lPacked = left.select(col(key).as("__k"),
      col(leftTime).cast("long").as("__t"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__l"))
    val rPacked = right.select(col(key).as("__k"),
      col(rightTime).cast("long").as("__t"), lit(0).as("__tag"),
      struct(col(rightTime).cast("long").as("asof_time"),
        struct(payload.map(col): _*).as("p")).as("__payload"))
    val lType = lPacked.schema("__l").dataType
    val rType = rPacked.schema("__payload").dataType
    // the payload tiebreak needs an orderable struct (a map-typed
    // payload column would fail ANALYSIS); non-orderable payloads fall
    // back to (time, tag) ordering — deterministic whenever (key,
    // time) has no right-side ties, exactly the pre-tiebreak contract
    val orderable = org.apache.spark.sql.catalyst.expressions
      .RowOrdering.isOrderable(rType)
    val ordering =
      if (orderable) Seq(col("__t"), col("__tag"), col("__payload"))
      else Seq(col("__t"), col("__tag"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPacked.withColumn("__payload", lit(null).cast(rType))
      .unionByName(rPacked.withColumn("__l", lit(null).cast(lType)))
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*") +:
        col("__match.asof_time").as("asof_time") +:
        payload.map(p => col(s"__match.p.$p").as(p)): _*)
  }

  /** Point-in-interval range join as an EQUI-join on a coarse time
    * bucket: each interval explodes to the buckets it overlaps; each
    * point probes its own single bucket, so a (point, interval) match
    * appears exactly once — no post-join dedup. This replaces the
    * BroadcastNestedLoopJoin a raw theta join would plan (a scan per
    * point at scale) with one hash shuffle on (key, bucket).
    * `bucketMs` trades interval replication (long intervals span more
    * buckets) against probe selectivity — choose ≈ the median
    * interval length. Containment is [start, end); empty/negative
    * intervals are dropped; times must be nonnegative longs.
    */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
      key: String, pointTime: String, startCol: String, endCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0)
    val ivB = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b", explode(sequence(
        expr(s"$startCol div $bucketMs"),
        expr(s"($endCol - 1) div $bucketMs"))))
    val ptB = points.withColumn("__b", expr(s"$pointTime div $bucketMs"))
    ptB.join(ivB, Seq(key, "__b"))
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__b")
  }

  /** Interval-overlap join: all (a, b) pairs with the same key whose
    * half-open spans intersect (aStart < bEnd ∧ bStart < aEnd). Both
    * sides explode to their overlapped buckets and equi-join — and
    * because two overlapping intervals can share MANY buckets, each
    * pair is kept only in its OWNER bucket, the one containing
    * max(aStart, bStart): exactly-once semantics with no dedup
    * shuffle (the standard trick from distributed spatial joins).
    * Column names across the two sides must be disjoint except `key`.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0)
    def burst(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__b", explode(sequence(
        expr(s"$s div $bucketMs"), expr(s"($e - 1) div $bucketMs"))))
    burst(a, aStart, aEnd).join(burst(b, bStart, bEnd), Seq(key, "__b"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__b") === expr(
        s"greatest($aStart, $bStart) div $bucketMs"))
      .drop("__b")
  }
}
