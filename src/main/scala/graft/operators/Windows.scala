package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sort / top-k / sessionization operators (SURVEY §2.6, A11,
  * A15, A16).
  *
  * The reference does all of this with Python list sorts and hand-rolled
  * state loops (`powerbi_main_fun.py:1954-1978` top-k;
  * `CalculateBrownouts/Blackouts:1709-1775` run-length). Here each is a
  * window-function plan: one shuffle on the partition key, then a sorted
  * single pass per partition — the shape that scales to 100 TB because
  * state never leaves the executor and AQE can split skewed keys.
  *
  * Tie-breaking: every `orderBy` includes a unique column so results are
  * total-ordered — nondeterministic ties are unacceptable under a
  * hash-compare gate (and a latent bug at scale, where partition order
  * varies run to run).
  */
object Windows {

  /** Top-k rows per group (A11, `powerbi_main_fun.py:1954-1974`): the
    * reference sorts the whole list and negative-indexes; this keeps only
    * k rows per group after one shuffle.
    */
  def topKPerGroup(df: DataFrame, key: String, measure: String,
      tiebreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(measure).desc, col(tiebreak))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Order statistics per group (A11: 1st/5th/10th highest,
    * `powerbi_main_fun.py:1970-1978`): collect+sort — ONLY for groups
    * of bounded cardinality (links per edge). For groups that grow
    * with the data use [[orderStatsScalable]].
    */
  def orderStats(df: DataFrame, key: String, measure: String,
      ranks: Seq[Int]): DataFrame = {
    val sorted = sort_array(collect_list(col(measure)), asc = false)
    val aggs = ranks.map(r => element_at(sorted, r).as(s"highest_$r"))
    // element_at is 1-based and yields null when the group is smaller
    // than r — matching the reference's silent skip of absent ranks.
    df.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Scale-safe order statistics: rank with a window, keep only rows
    * ranked ≤ max(ranks), pivot the survivors into columns. Per-group
    * state is max(ranks) rows instead of the whole group — survives
    * groups of any size. Ties broken by value order only (same as the
    * reference's plain sort); identical output to [[orderStats]]
    * because equal values are interchangeable at equal ranks.
    */
  def orderStatsScalable(df: DataFrame, key: String, measure: String,
      ranks: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(measure).desc)
    val aggs = ranks.map(r =>
      max(when(col("__rn") === r, col(measure))).as(s"highest_$r"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= ranks.max)
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fixed-size chunk scoring with a final min (A16 `lowest_qoe`,
    * `powerbi_main_fun.py:1778-1804`): samples are chunked 8-at-a-time in
    * event order, each chunk scored `(n_sev4*10 + n_sev3*5)/8`, and the
    * minimum chunk score kept per key.
    */
  def chunkedMinScore(df: DataFrame, key: String, ts: String, tiebreak: String,
      sev4: Column, sev3: Column, chunk: Int,
      // the reference divides by a LITERAL 8 regardless of chunk size
      // (`powerbi_main_fun.py:1797`, same quirk as Qoe.lowestQoe) —
      // callers chunking differently must still opt into a divisor
      // explicitly
      divisor: Double = 8.0d): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    df.withColumn("chunk_id", ((row_number().over(w) - 1) / chunk).cast("long"))
      .groupBy(col(key), col("chunk_id"))
      .agg(((count(when(sev4, 1)) * 10 + count(when(sev3, 1)) * 5)
             / lit(divisor)).as("chunk_score"))
      .groupBy(col(key))
      .agg(min(col("chunk_score")).as("lowest_score"),
           count(lit(1)).as("n_chunks"))
  }

  /** State-transition counter (A15's declarative core,
    * `CalculateBrownouts:1709-1741`): brownout = 4→2 transition,
    * blackout = {4,3,2}→0. Generalized: count rows whose previous state
    * (per key, in time order) satisfies `from` and current satisfies
    * `to`.
    */
  def transitionCounts(df: DataFrame, key: String, ts: String, tiebreak: String,
      state: String, transitions: Seq[(String, Column => Column, Column => Column)])
      : DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val withPrev = df.withColumn("prev_state", lag(col(state), 1).over(w))
    val aggs = transitions.map { case (name, fromP, toP) =>
      count(when(fromP(col("prev_state")) && toP(col(state)), 1)).as(name)
    }
    withPrev.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Run-length encoding via the segment-id trick (A15's duration side):
    * a new run starts when the state differs from the previous row's;
    * `run_id = count of starts so far` partitions rows into maximal
    * constant-state runs without any stateful UDF.
    */
  def runLengths(df: DataFrame, key: String, ts: String, tiebreak: String,
      state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    df.withColumn("is_start",
        when(lag(col(state), 1).over(w).isNull ||
             lag(col(state), 1).over(w) =!= col(state), 1).otherwise(0))
      .withColumn("run_id", sum(col("is_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("run_id"), col(state))
      .agg(count(lit(1)).as("run_len"))
  }

  /** Gap-based sessionization (§2.8 sessionization analog): a session
    * breaks when the gap to the previous event exceeds `gapSeconds`.
    */
  def sessionize(df: DataFrame, key: String, ts: String, tiebreak: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    df.withColumn("prev_ts", lag(col(ts), 1).over(w))
      .withColumn("is_new",
        // millisecond arithmetic: unix_timestamp floors to seconds, which
        // disagrees with sub-second oracles; unix_millis matches DuckDB's
        // epoch_ms exactly.
        when(col("prev_ts").isNull ||
             unix_millis(col(ts)) - unix_millis(col("prev_ts")) > gapSeconds * 1000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Tumbling time-window aggregation (§2.8, the 30×24 h QoE loop
    * `powerbi_main_fun.py:1894-1918` and daily `Date` grain): one
    * groupBy on (day, dims) replaces the reference's per-day API loop.
    */
  def tumblingDaily(df: DataFrame, ts: String, dims: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    val keys = to_date(col(ts)).as("day") +: dims.map(col)
    df.groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** TRUE debounce readout per key: an event is KEPT when it arrives
    * more than `quietMs` after the previously KEPT event — the
    * alert-suppression / duplicate-webhook rule. This is a genuine
    * sequential recurrence (kept-ness depends on which earlier events
    * were kept, so no window frame expresses it); it runs as a
    * per-key ordered fold over the collected millisecond array — the
    * [[TimeSeries.ewmaDaily]] discipline: bit-stable under any
    * partitioning because the fold order is the sorted array, with
    * integer state only. The array is events-per-key long — bound the
    * hot key upstream (sampleByKey) when a key's day exceeds memory.
    * Output: (key, n_events, n_kept, last_kept_ms).
    */
  def debounceCounts(df: DataFrame, key: String, ts: String,
      quietMs: Long): DataFrame = {
    require(quietMs > 0)
    // far enough below any epoch that the first event always keeps,
    // yet subtraction cannot overflow
    val neverKept = -4611686018427387904L
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(unix_millis(col(ts)))).as("__ms"))
      .select(col(key), col("n_events"),
        aggregate(col("__ms"),
          struct(lit(neverKept).as("last"), lit(0L).as("kept")),
          (acc, x) =>
            when(x - acc.getField("last") > quietMs,
              struct(x.as("last"),
                (acc.getField("kept") + 1L).as("kept")))
              .otherwise(acc)).as("st"))
      .select(col(key), col("n_events"), col("st.kept").as("n_kept"),
        col("st.last").as("last_kept_ms"))
  }
}
