package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** QoE outage semantics (SURVEY A15/A16), reference-exact.
  *
  * The reference scans each link-day's ordered state samples (200 per
  * 24 h, ~7.12 s apart) with index loops:
  * `CalculateBrownouts` (`powerbi_main_fun.py:1709-1741`): for every
  * index holding a 4, if the NEXT sample is 2 count one brownout and
  * start a timer that runs while consecutive 2s continue.
  * `CalculateBlackouts` (`1744-1775`): same shape targeting 0, invoked
  * three times (preceding state 3, 2, 4) and summed (`1857-1875`).
  * `lowest_qoe` (`1778-1804`): chunk samples 8 at a time (the last
  * chunk may be short), score each `(#4s*10 + #3s*5)/8`, take the min.
  *
  * Two implementations are provided and property-tested equal:
  *
  *  1. [[transitions]]/[[dailyLinkOutages]] — the literal loop, run
  *     per group via `groupByKey.flatMapGroups` ([[outagesByGroup]]).
  *     Order-dependent state machines belong in plain Scala for
  *     testability (SURVEY §2.9); Spark only guarantees the per-group
  *     sort, and state never crosses an executor boundary.
  *  2. [[dailyOutagesDF]] — the declarative restatement: a run of
  *     `to`-state samples contributes (1 outage, run-length timer)
  *     iff the element immediately before the run is `from`. One
  *     window + one groupBy; whole-stage codegen end to end; scales
  *     to arbitrary samples-per-day because nothing is collected.
  *
  * Equivalence argument (encoded as a scalacheck property, not just
  * believed): the loop adds 1 to the count and `L` to the timer for
  * each maximal `to`-run of length `L` whose immediate predecessor
  * sample is `from` — index `i` with `list[i]==from`,
  * `list[i+1]==to` starts the run; the inner walk from `i+2` adds the
  * remaining `L-1`.
  */
object Qoe {

  /** Literal port of the CalculateBrownouts/Blackouts loop shape:
    * returns (count, timerTicks) for `from`→`to` transitions.
    */
  def transitions(states: IndexedSeq[Int], from: Int, to: Int): (Int, Int) = {
    var count = 0
    var timer = 0
    val last = states.length - 1
    var i = 0
    while (i <= last) {
      if (states(i) == from && i + 1 <= last && states(i + 1) == to) {
        count += 1
        timer += 1
        if (i + 2 <= last && states(i + 2) == to) {
          var t = i + 2
          while (t <= last && states(t) == to) { timer += 1; t += 1 }
        }
      }
      i += 1
    }
    (count, timer)
  }

  /** `lowest_qoe` (`powerbi_main_fun.py:1778-1804`): fixed divisor 8
    * regardless of last-chunk size; an empty series yields one empty
    * chunk scoring 0.0 (the reference's `min` never sees an empty
    * list, so it never returns None in practice).
    */
  def lowestQoe(states: Seq[Int], size: Int = 8): Double = {
    val chunks = if (states.isEmpty) Seq(Seq.empty[Int])
                 else states.grouped(size).toSeq
    chunks.map { c =>
      val n4 = c.count(_ == 4); val n3 = c.count(_ == 3)
      (n4 * 10 + n3 * 5) / 8.0d
    }.min
  }

  /** Outage row for one (entity, day): the exact quantities
    * `calculate_edge_link_qoe` writes to DailyQOE
    * (`powerbi_main_fun.py:1857-1880`). Durations are
    * `round(ticks*7.12/60, 3)` minutes (7.12 s per sample).
    */
  def dailyLinkOutages(states: IndexedSeq[Int]): (Int, Double, Int, Double, Double) = {
    val (brownouts, brownTicks) = transitions(states, 4, 2)
    // Blackout preceding states summed in the reference's call order
    // (3, then 2, then 4) — addition is commutative, order kept for
    // documentation fidelity.
    val blackParts = Seq(3, 2, 4).map(s => transitions(states, s, 0))
    val blackouts = blackParts.map(_._1).sum
    val blackTicks = blackParts.map(_._2).sum
    // BigDecimal.valueOf (shortest double repr) + HALF_UP is exactly
    // Spark's Round on DoubleType — keeps both paths bit-identical.
    def minutes(ticks: Int): Double =
      java.math.BigDecimal.valueOf(ticks * 7.12 / 60)
        .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
    (brownouts, minutes(brownTicks), blackouts, minutes(blackTicks),
      lowestQoe(states))
  }

  private val outSchema = StructType(Seq(
    StructField("group_key", LongType),
    StructField("day", DateType),
    StructField("n_brownouts", IntegerType),
    StructField("brownout_min", DoubleType),
    StructField("n_blackouts", IntegerType),
    StructField("blackout_min", DoubleType),
    StructField("lowest_score", DoubleType)))

  /** Path 1: the literal loop applied per (key, day) group. Input must
    * carry a LONG key, a DATE day, an orderable (ts, tiebreak) and an
    * INT state. The per-group sort happens inside the group iterator
    * (Spark does not sort groups for us); group size is bounded by
    * samples-per-day (200 in the reference), so the sort is O(day)
    * not O(table).
    */
  def outagesByGroup(df: DataFrame, key: String, day: Column, ts: String,
      tiebreak: String, state: String): DataFrame = {
    val prepared = df.select(
      col(key).cast("long").as("group_key"),
      day.cast("date").as("day"),
      col(ts).cast("timestamp").as("ts"),
      col(tiebreak).cast("long").as("tb"),
      col(state).cast("int").as("state"))
    val rowEnc = Encoders.row(outSchema)
    prepared
      .groupByKey(r => (r.getLong(0), r.getDate(1).toString))(
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .flatMapGroups { (k: (Long, String), rows: Iterator[Row]) =>
        // full-microsecond ordering: getTime() truncates to millis,
        // which would disagree with the (ts, tiebreak) contract and
        // the oracle whenever two events share a millisecond
        def micros(t: java.sql.Timestamp): Long =
          t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
        val sorted = rows.toIndexedSeq.sortBy(r =>
          (micros(r.getTimestamp(2)), r.getLong(3)))
        val states = sorted.map(_.getInt(4))
        val (nb, bm, nk, km, lo) = dailyLinkOutages(states)
        Iterator(Row(k._1, java.sql.Date.valueOf(k._2), nb, bm, nk, km, lo))
      }(rowEnc)
  }

  /** Path 2: declarative run-length restatement. See object doc for
    * the equivalence argument; [[QoeSpec]] checks it by property.
    */
  def dailyOutagesDF(df: DataFrame, key: String, day: Column, ts: String,
      tiebreak: String, state: String): DataFrame = {
    // Maximal constant-state runs via the segment-id trick, keeping
    // each run's immediately-preceding state.
    val wDay = Window.partitionBy(col(key), col("day")).orderBy(col(ts), col(tiebreak))
    val marked = df
      .withColumn("day", day)
      .withColumn("prev_state", lag(col(state), 1).over(wDay))
      .withColumn("is_start",
        when(col("prev_state").isNull || col("prev_state") =!= col(state), 1)
          .otherwise(0))
      .withColumn("run_id",
        sum(col("is_start")).over(wDay.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = marked.groupBy(col(key), col("day"), col("run_id"))
      .agg(
        first(col(state)).as("run_state"),
        // prev_state of the run's first row = state before the run
        min(struct(col(ts), col(tiebreak), col("prev_state")))
          .getField("prev_state").as("pred_state"),
        count(lit(1)).as("run_len"))
    val brown = col("run_state") === 2 && col("pred_state") === 4
    val black = col("run_state") === 0 && col("pred_state").isin(2, 3, 4)
    runs.groupBy(col(key), col("day"))
      .agg(
        count(when(brown, 1)).cast("int").as("n_brownouts"),
        round(coalesce(sum(when(brown, col("run_len"))), lit(0L)) * 7.12 / 60, 3)
          .as("brownout_min"),
        count(when(black, 1)).cast("int").as("n_blackouts"),
        round(coalesce(sum(when(black, col("run_len"))), lit(0L)) * 7.12 / 60, 3)
          .as("blackout_min"))
  }
}
