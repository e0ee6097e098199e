package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive parallelism shim for CPU-dense map stages (guide
  * §2.2): a local parquet source often arrives as a SINGLE split, so
  * an expensive narrow transformation above it (char-gram explosion,
  * per-order shingling, regex scoring, md5 resampling) runs as a
  * one-task stage while the rest of the machine idles. `byKey`
  * hash-spreads the frame to the session's default parallelism — and
  * is a NO-OP whenever the planner's size estimate says the source
  * already splits at least that wide, which is exactly the 100 TB
  * case (a corpus-scale scan has thousands of input splits, so
  * production pays no extra exchange; only the under-split local
  * case buys one).
  *
  * The width probe is STATIC — optimizer stats over
  * `files.maxPartitionBytes` — never `.rdd`/execution (under AQE,
  * converting a shuffle- or join-rooted frame to an RDD eagerly
  * materializes its upstream stages, which would run the subtree
  * twice). Hash partitioning by a stable key, not round-robin:
  * deterministic row placement and no local-sort prelude.
  */
object Spread {
  def byKey(df: DataFrame, keyCol: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val maxPart = math.max(1L,
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // compare in BigInt (ADVICE r15): sizeInBytes is a BigInt and
    // join-cardinality products can exceed Long range — a .toLong
    // there wraps negative and would fire a corpus-wide repartition
    // exactly in the at-scale case this probe exists to no-op on
    val estSplits = bytes / maxPart + 1
    if (estSplits >= BigInt(target)) df
    else df.repartition(target, col(keyCol))
  }
}
