package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution: edit-distance matching without the
  * all-pairs cartesian.
  *
  * The scale discipline is two-fold:
  *  1. **Distinct-first** — names repeat massively in row data (the
  *     same distinct-value trick as the geo enrichment): the match runs
  *     over the DISTINCT name set, and a broadcast join maps matches
  *     back to rows if a caller needs row grain. |distinct| grows far
  *     slower than |rows| (here it is constant across SF).
  *  2. **Blocking** — candidate pairs only form inside a block (a
  *     cheap deterministic key: a token, a phonetic code, a length
  *     band), so pair count is Σ|block|², never |names|². Skewed
  *     blocks are AQE's skew-join case; a second blocking column
  *     bounds them deterministically.
  *
  * `levenshtein` is Spark's codegen'd built-in and a DuckDB built-in
  * with identical classic edit-distance semantics, so the operator is
  * fully oracle-gated.
  */
object FuzzyMatch {

  /** All distinct-name pairs within a block at edit distance ≤
    * `maxDist`. Output: (name_a, name_b, dist), name_a < name_b so
    * each unordered pair appears once.
    */
  def blockedNameMatch(df: DataFrame, nameCol: String,
      block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val a = df.select(col(nameCol).as("name_a")).distinct()
      .withColumn("__blk", block(col("name_a")))
    val b = a.select(col("name_a").as("name_b"),
      col("__blk").as("__blk_b"))
    a.join(b,
        col("__blk") === col("__blk_b") && col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** Sorted-neighborhood entity resolution (Hernández & Stolfo,
    * SIGMOD'95): sort all names by `sortKey`, compare each name only
    * to its `window` successors in the sort order — the complementary
    * blocking axis to [[blockedNameMatch]] (token blocking misses
    * pairs that differ in the block token; neighborhood sorting
    * catches them when the sort key clusters them adjacently).
    * Output: (name_a, name_b, dist, gap) for pairs at edit distance
    * ≤ `maxDist` within `window` positions, name_a the lower-ranked.
    *
    * The global rank uses the order-aligned first-character bucket
    * trick (the q335 discipline): per-bucket row_number + a
    * bucket-count prefix frame — NO data-sized single-partition
    * window. Candidate pairs come from a block join (blocks of width
    * `window`, right side replicated to its own and previous block),
    * so the join is block-keyed and each name meets ≤ 2·window
    * candidates — never all-pairs. Skewed first characters widen one
    * bucket's window; lengthen the prefix to re-split.
    */
  def sortedNeighborhoodMatch(df: DataFrame, nameCol: String,
      sortKey: Column => Column, window: Int, maxDist: Int): DataFrame = {
    require(window >= 1 && maxDist >= 0)
    import org.apache.spark.sql.expressions.Window
    val n = df.select(col(nameCol).as("nm")).distinct()
      .withColumn("__sk", sortKey(col("nm")))
      .withColumn("__b", substring(col("__sk"), 1, 1))
    val offs = n.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val ranked = n.join(broadcast(offs), Seq("__b"))
      .withColumn("rn", col("__off") - 1 + row_number().over(
        Window.partitionBy(col("__b")).orderBy(col("__sk"), col("nm"))))
      .select(col("nm"), col("rn"))
    val blockW = window.toLong
    val withBlk = ranked.withColumn("__blk", expr(s"rn div ${blockW}L"))
    val left = withBlk.select(col("nm").as("name_a"),
      col("rn").as("rn_a"), col("__blk"))
    val right = withBlk.select(col("nm").as("name_b"),
      col("rn").as("rn_b"),
      explode(array(col("__blk"), col("__blk") - 1)).as("__blk"))
    left.join(right, Seq("__blk"))
      .filter(col("rn_b") > col("rn_a") &&
        col("rn_b") - col("rn_a") <= blockW)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        (col("rn_b") - col("rn_a")).as("gap"))
  }
}
