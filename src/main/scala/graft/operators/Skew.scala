package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (the 100 TB levers AQE can't always pull:
  * a single hot key — one giant tenant, one viral document — that
  * overwhelms its reducer even after AQE splits).
  *
  * Both operators are deterministic: salts derive from row content
  * (xxhash64), never from randomness, so retried tasks re-produce the
  * same partitioning (a nondeterministic salt makes shuffle-retry
  * output silently wrong).
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on
    * (key, salt ∈ [0, factor)) spreads a hot key over `factor`
    * reducers, then the tiny partial set re-aggregates on the key
    * alone. Correct for algebraic aggregates (sum/count/min/max) —
    * the caller names partial and final in matching pairs.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      factor: Int): DataFrame = {
    val salted = df
      // row-position salt, NOT content-derived: a viral key whose rows
      // share one value would otherwise collapse into a single salt
      // bucket and reproduce the hot reducer. monotonically_increasing_id
      // is NOT guaranteed stable under task retry / AQE re-planning —
      // that is fine HERE because the salt only spreads rows and never
      // changes the algebraic re-aggregation, but do not reuse this
      // salt where per-row stability matters (use a content hash +
      // disambiguator there instead).
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    salted.groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Salted broadcast-unfriendly join: the fact side salts each row
    * deterministically; the (small-ish but not broadcastable) build
    * side is replicated once per salt value so every (key, salt)
    * partition finds its match. Shuffle volume: fact unchanged, build
    * × factor — the standard trade for eliminating the hot reducer.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      factor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      // row-position salt for the same reason as saltedSumCount:
      // duplicate hot-key rows must spread, and a content hash sends
      // identical rows to one bucket
      pmod(monotonically_increasing_id(), lit(factor)))
    val replicatedBuild = build
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** The two levers COMPOSED into the production shape: detect the hot
    * keys ([[Relational.hotKeys]] — per-partition top-N, driver merges
    * N rows), split the fact on hot-key membership (broadcast
    * semi/anti — the hot set is N rows, no shuffle to split), salt
    * ONLY the hot slice, join the cold slice plainly, union. The cold
    * path pays nothing; the hot path pays build-replication only for
    * the keys that actually overwhelm a reducer — at 100 TB this is
    * the difference between salting the whole build side ×factor and
    * salting a handful of rows.
    *
    * The hot-key frame is localCheckpointed: it gates three joins and
    * recomputing the detection scan per consumer would triple the
    * fact-scan cost.
    */
  def adaptiveSkewJoin(fact: DataFrame, build: DataFrame, key: String,
      topN: Int, factor: Int): DataFrame = {
    val hot = Relational.hotKeys(fact, key, topN)
      .select(col(key)).localCheckpoint(true)
    val hotFact = fact.join(broadcast(hot), Seq(key))
    val coldFact = fact.join(broadcast(hot), Seq(key), "left_anti")
    val hotBuild = build.join(broadcast(hot), Seq(key))
    saltedJoin(hotFact, hotBuild, key, factor)
      .unionByName(coldFact.join(build, Seq(key)))
  }
}
