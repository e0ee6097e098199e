package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history — the warehouse pattern
  * the reference's gold layer implies but never materializes (its
  * upserts are type-1: `last_updated` overwrite, SURVEY §2.2 K1/K4;
  * attribute history is lost). SCD2 keeps every attribute version as
  * a validity interval [valid_from, valid_to), `valid_to IS NULL`
  * marking the current row — the shape a point-in-time join
  * (TemporalJoins) probes against.
  *
  * Two shapes, both O(one keyed shuffle):
  *  - [[fromChangeLog]] — bulk timeline reconstruction from an event
  *    stream (backfill / first build): window pass per key.
  *  - [[merge]] — incremental maintenance of an existing history from
  *    a batch of latest-state updates (the nightly job): one key join.
  */
object Scd2 {

  /** Rebuild the full SCD2 timeline from a change log: rows where any
    * tracked attribute differs from the key's previous row (ordered
    * by `tsCol`, tie-broken by `seqCol` so the timeline is total)
    * open a new interval; `valid_to` is the next interval's start,
    * NULL while current.
    *
    * Cost: ONE hash shuffle on the key; both window passes (change
    * detection, then interval close over the surviving change rows)
    * sort within the same partitioning, so no second exchange. At
    * 100 TB the change log is the big side and this is its only
    * shuffle; WindowExec spills rather than OOMs on a hot key.
    */
  def fromChangeLog(events: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String, seqCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val keyCs = keyCols.map(col)
    val w = Window.partitionBy(keyCs: _*).orderBy(col(tsCol), col(seqCol))
    // null-safe change predicate: first row per key must open an
    // interval even when its attrs are NULL (lag's null would <=>
    // a null attr and read as "unchanged")
    val changed: Column = attrCols
      .map(c => !(lag(col(c), 1).over(w) <=> col(c)))
      .reduce(_ || _)
    // window exprs must be projected before they can be filtered on
    val marked = events
      .select((keyCols ++ attrCols).map(col) :+ col(tsCol) :+ col(seqCol): _*)
      .withColumn("__open", row_number().over(w) === 1 || changed)
      .filter(col("__open"))
    val wc = Window.partitionBy(keyCs: _*).orderBy(col(tsCol), col(seqCol))
    marked
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Incrementally maintain an SCD2 history from a batch of
    * latest-state updates (ONE row per key — dedupe upstream; the
    * deterministic latest-wins pick needs a total tiebreak only the
    * caller can name). Semantics per update key:
    *  - attrs differ from the current row AND the update timestamp is
    *    strictly after the current version's start → close the
    *    current row at the update timestamp and append a new current
    *    version;
    *  - attrs null-safe-equal → no-op (idempotent replays are safe);
    *  - a LATE changed update (timestamp ≤ current valid_from) is
    *    IGNORED — closing would mint an inverted interval and promote
    *    stale state to current, so out-of-order redelivery converges
    *    to the newest state instead (a current row with NULL
    *    valid_from reads as unknown-start: any timestamped update may
    *    close it);
    *  - key absent from history → new current row.
    * Closed history rows pass through untouched.
    *
    * Cost: ONE key join of the CURRENT slice against the update
    * batch, executed once — each joined row emits its ≤2 output
    * versions through an array+explode rather than per-branch filters
    * that would re-run the join. The update side is the nightly
    * delta, broadcast-sized in practice (left to AQE rather than
    * hinted: a backfill-sized batch must be allowed to shuffle).
    */
  def merge(history: DataFrame, updates: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val toType = history.schema("valid_to").dataType
    val closedHist = history.filter(col("valid_to").isNotNull)
    // explicit presence markers, NOT null-sentinel columns: a current
    // row with NULL valid_from (unknown start) must still count as
    // present, never silently vanish from the merge
    val cur = history.filter(col("valid_to").isNull)
      .select(keyCols.map(col) ++
        attrCols.map(c => col(c).as(s"__h_$c")) :+
        col("valid_from").as("__h_from") :+ lit(true).as("__has_h"): _*)
    val upd = updates.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"__u_$c")) :+
      col(tsCol).as("__u_ts") :+ lit(true).as("__has_u"): _*)
    val j = cur.join(upd, keyCols, "full_outer")
    val hasCur = col("__has_h").isNotNull
    val hasUpd = col("__has_u").isNotNull
    val changed = attrCols
      .map(c => !(col(s"__h_$c") <=> col(s"__u_$c")))
      .reduce(_ || _)
    val closes = hasCur && hasUpd && changed &&
      (col("__h_from").isNull || col("__u_ts") > col("__h_from"))
    val opens = hasUpd && (!hasCur || closes)
    def ver(attrOf: String => Column, from: Column, to: Column) =
      struct(attrCols.map(c => attrOf(c).as(c)) :+
        from.as("valid_from") :+ to.cast(toType).as("valid_to"): _*)
    val versions = array(
      // the current version: closed at the update ts when superseded,
      // open (NULL valid_to) when kept
      when(hasCur, ver(c => col(s"__h_$c"), col("__h_from"),
        when(closes, col("__u_ts")))),
      // the new current version: changed keys and first-seen keys
      when(opens, ver(c => col(s"__u_$c"), col("__u_ts"), lit(null))))
    val merged = j
      .select(keyCols.map(col) :+
        explode(filter(versions, v => v.isNotNull)).as("__v"): _*)
      .select(keyCols.map(col) ++
        attrCols.map(c => col(s"__v.$c").as(c)) :+
        col("__v.valid_from").as("valid_from") :+
        col("__v.valid_to").as("valid_to"): _*)
    closedHist.select(keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to")): _*)
      .unionByName(merged)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time enrichment — the read side of SCD2: attach to every
    * fact row the dimension version whose validity interval contains
    * the fact's timestamp (NULL attrs when no version was live). Rides
    * [[TemporalJoins.asOfBackward]]'s union-merge: ONE shuffle on the
    * key, a sort within partitions, zero row amplification — never
    * the join-filter-argmax plan that explodes by versions-per-key.
    * On a well-formed history the greatest valid_from ≤ ts IS the
    * containing interval (intervals are contiguous by construction);
    * the explicit containment check guards gapped histories — a fact
    * falling in a gap gets NULLs, not the stale predecessor. A NULL
    * valid_from version reads as unknown-start (matches any earlier
    * fact). Timestamps must cast to long (epoch grain is free but
    * must agree across facts and history).
    */
  def pitLookup(facts: DataFrame, history: DataFrame, keyCol: String,
      factTsCol: String, attrCols: Seq[String]): DataFrame = {
    // explicit hit marker: `asof_time` is NULL both for "no version"
    // and for a matched unknown-start version (NULL valid_from), so
    // it cannot distinguish them
    val versioned = history.select(
      col(keyCol) +: (attrCols.map(col) :+ col("valid_from") :+
        col("valid_to") :+ lit(true).as("__pit_hit")): _*)
    val joined = TemporalJoins.asOfBackward(facts, versioned, keyCol,
      factTsCol, "valid_from", attrCols ++ Seq("valid_to", "__pit_hit"))
    val contains = col("__pit_hit").isNotNull &&
      (col("valid_to").isNull ||
        col(factTsCol).cast("long") < col("valid_to").cast("long"))
    joined
      .select(facts.columns.map(col) ++
        attrCols.map(a => when(contains, col(a)).otherwise(lit(null))
          .as(a)): _*)
  }
}
