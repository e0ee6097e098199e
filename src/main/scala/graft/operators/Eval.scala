package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-based text-overlap metrics — the ROUGE/BLEU counting
  * core (clipped n-gram matches) used to score generated text against
  * references, and equally to audit paraphrase/near-dup pairs. All
  * arithmetic is exact-integer (clipped counts, ppm ratios by
  * integral div), so the scores hash-gate across engines.
  *
  * Shape at 100 TB: n-gram count frames are (doc × distinct-gram)
  * partial aggs riding one text scan; the pair scoring is two
  * gram-keyed equi-joins bounded by the pair list — never all-pairs,
  * never a per-pair re-tokenization.
  */
object Eval {

  /** Unigram (doc, gram, c) counts off [[TextAnalysis.tokens]]. */
  private def uniCounts(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))

  /** Bigram (doc, gram, c) counts; the empty/1-token guard matters —
    * sequence(1, 0) steps DOWNWARD in Spark (the q215 lesson), so the
    * position list must be gated on size ≥ 2, not sliced.
    */
  private def biCounts(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val grams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "),
          element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("id"), explode(grams).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
  }

  /** Clipped-match totals for one n-gram order: per (id_a, id_b)
    * pair, Σ_g min(c_a(g), c_b(g)) — BLEU's modified precision
    * numerator ≡ ROUGE's match count. One gram-keyed join between
    * the two count frames restricted to the pair list.
    */
  private def clipped(pairs: DataFrame, counts: DataFrame,
      out: String): DataFrame = {
    val a = counts.select(col("id").as("id_a"), col("g"),
      col("c").as("ca"))
    val b = counts.select(col("id").as("id_b"), col("g"),
      col("c").as("cb"))
    pairs.join(a, Seq("id_a")).join(b, Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("ca"), col("cb"))).as(out))
  }

  /** ROUGE-1/ROUGE-2 precision & recall (ppm) for each (id_a, id_b)
    * pair, treating id_a as candidate and id_b as reference:
    * p_n = clip_n / |a|_n, r_n = clip_n / |b|_n. Pairs with no
    * shared grams score 0, not null; single-token docs have zero
    * bigram mass (guarded div).
    */
  def rougeOverlap(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // each count frame feeds two size joins + one clipped join —
    // checkpoint so the text is tokenized ONCE per order, not 3×
    // (the frames are (doc × distinct-gram)-sized, far below the
    // corpus)
    val uni = uniCounts(docs, idCol, textCol).localCheckpoint(true)
    val bi = biCounts(docs, idCol, textCol).localCheckpoint(true)
    def sizes(counts: DataFrame, idOut: String, nOut: String) =
      counts.groupBy(col("id").as(idOut)).agg(sum(col("c")).as(nOut))
    val p = pairs.select(col("id_a"), col("id_b"))
    p
      // LEFT like the bigram joins: a pair whose candidate or
      // reference tokenizes to ZERO unigrams (empty/whitespace text)
      // must survive with all-zero scores, not vanish from the output
      .join(sizes(uni, "id_a", "n_a1"), Seq("id_a"), "left")
      .join(sizes(uni, "id_b", "n_b1"), Seq("id_b"), "left")
      .join(sizes(bi, "id_a", "n_a2"), Seq("id_a"), "left")
      .join(sizes(bi, "id_b", "n_b2"), Seq("id_b"), "left")
      .join(clipped(p, uni, "clip1"), Seq("id_a", "id_b"), "left")
      .join(clipped(p, bi, "clip2"), Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("n_a1"), lit(0L)).as("n_a1"),
        coalesce(col("n_b1"), lit(0L)).as("n_b1"),
        coalesce(col("clip1"), lit(0L)).as("clip1"),
        coalesce(col("n_a2"), lit(0L)).as("n_a2"),
        coalesce(col("n_b2"), lit(0L)).as("n_b2"),
        coalesce(col("clip2"), lit(0L)).as("clip2"))
      .withColumn("p1_ppm", expr("clip1 * 1000000L div greatest(n_a1, 1L)"))
      .withColumn("r1_ppm", expr("clip1 * 1000000L div greatest(n_b1, 1L)"))
      .withColumn("p2_ppm", expr("clip2 * 1000000L div greatest(n_a2, 1L)"))
      .withColumn("r2_ppm", expr("clip2 * 1000000L div greatest(n_b2, 1L)"))
  }

  /** Position-discount weights for [[ndcgAtK]]: ⌊10⁶ / log₂(i+1)⌋
    * for ranks 1..k. Computed ONCE driver-side and interpolated as
    * literal constants into both engines — the floats never cross an
    * engine boundary, so the metric stays hash-gateable.
    */
  def ndcgWeightsPpm(k: Int): Seq[Long] =
    (1 to k).map(i =>
      (1000000.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** nDCG@k over graded relevance in exact integer ppm:
    * DCG = Σ_{rank ≤ k} grade · w(rank) with the precomputed
    * [[ndcgWeightsPpm]] discounts, IDCG the same sum over the
    * query's grades sorted descending (ties broken by doc id for
    * determinism), ndcg_ppm = ⌊DCG·10⁶ / IDCG⌋ (0 when IDCG = 0 —
    * a query with no relevant docs scores 0, not null).
    *
    * Inputs: `ranked` (qid, rank, doc) with rank 1-based from the
    * system under test; `grades` (qid, doc, grade ≥ 0) the qrels.
    * Both windows are QUERY-partitioned (candidate-pool-bounded) —
    * never a corpus-wide window; the join is (qid, doc)-keyed.
    */
  def ndcgAtK(ranked: DataFrame, grades: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val ws = ndcgWeightsPpm(k)
    def weightOf(rankCol: Column): Column =
      ws.zipWithIndex.foldLeft(lit(0L)) { case (acc, (w, i)) =>
        when(rankCol === (i + 1), lit(w)).otherwise(acc)
      }
    val dcg = ranked.filter(col("rank") <= k)
      .join(grades, Seq("qid", "doc"), "left")
      .withColumn("__g", coalesce(col("grade"), lit(0L)))
      .groupBy(col("qid"))
      .agg(sum(col("__g") * weightOf(col("rank"))).as("dcg"))
    val ideal = grades
      .withColumn("__ir", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("grade").desc, col("doc"))))
      .filter(col("__ir") <= k)
      .groupBy(col("qid"))
      .agg(sum(col("grade") * weightOf(col("__ir"))).as("idcg"))
    dcg.join(ideal, Seq("qid"), "left")
      .select(col("qid"), col("dcg"),
        coalesce(col("idcg"), lit(0L)).as("idcg"))
      .withColumn("ndcg_ppm",
        when(col("idcg") === 0, lit(0L))
          .otherwise(expr("dcg * 1000000L div idcg")))
  }
}
