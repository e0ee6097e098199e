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
}
