package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model corpus statistics and per-document surprise
  * scoring — the LM-based quality signal of training-data pipelines
  * (CCNet-style perplexity filtering), re-expressed with integer-exact
  * arithmetic so the whole path is oracle-checkable bit-for-bit: the
  * conditional probability p(w2|w1) is carried as parts-per-million
  * via integer division, never as a float log-prob, so partial-agg
  * order can't perturb the result. (A float log-prob variant would be
  * the production scoring head; the integer form IS the ranking-
  * equivalent signal for fixed ppm precision.)
  *
  * 100 TB shape: the model is a (bg, c12, c1) frame ∝ DISTINCT
  * bigrams (vocabulary-bounded, not corpus-bounded) built by one
  * explode + two partial-agg shuffles; scoring joins each doc's
  * distinct bigrams against it — a shuffle join keyed by the bigram
  * string, with per-doc multiplicity pre-aggregated so the join
  * carries one row per (doc, distinct bigram), not per occurrence.
  */
object LanguageModel {

  /** Per-doc bigram list as (w1, w2) structs over an ARBITRARY symbol
    * array: tokens zipped with their successors — pure projection, no
    * shuffle. The corpus-scale text path uses [[bigramKeys]] instead
    * (native codegen); this array form serves callers that already
    * hold symbol arrays (e.g. [[Bpe.pairCounts]]).
    */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))

  /** Per-doc bigram keys as single case-folded "w1 w2" strings via
    * the native one-pass [[graft.expressions.WordShingles]] (2-token
    * shingles ARE bigrams; tokens contain no spaces, so the string
    * encodes the pair losslessly and the head is `substring_index
    * (bg, ' ', 1)`). Codegen beats the interpreted zip_with lambda on
    * the corpus-wide hot path, and a single string key halves the
    * shuffle-key width vs a two-column pair. Documents with fewer
    * than two tokens yield NO bigrams — WordShingles' whole-text
    * fallback is guarded off to keep bigram semantics.
    */
  def bigramKeys(textCol: Column): Column = {
    val toks = TextAnalysis.tokens(textCol)
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(graft.expressions.WordShingles.shinglesNative(textCol, 2))
  }

  /** Corpus bigram model keyed by the "w1 w2" string: c12 = count of
    * bigram occurrences, c1 = count of w1-as-head occurrences (= Σ
    * c12 over w2, so one count table serves both). The heads
    * aggregate runs over the DISTINCT-bigram frame, so its shuffle is
    * vocabulary-bounded.
    */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame = {
    val bg = docs
      .select(explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("c12"))
    val heads = bg
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    bg.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(heads, "w1")
      .select(col("bg"), col("c12"), col("c1"))
  }

  /** Per-document surprise against a [[bigramCounts]] model: each
    * bigram scores ppm = (1e6·c12) div c1 — integer parts-per-million
    * of p(w2|w1) — and the doc aggregates
    *  - n_bigrams: total bigram occurrences,
    *  - surprise_ppm: Σ ppm over occurrences (low ⇒ rare transitions
    *    ⇒ surprising text; the integer analog of summed log-prob),
    *  - n_novel: occurrences of bigrams whose EVERY corpus occurrence
    *    is in this doc (c12 == in-doc multiplicity).
    * The model join is a LEFT join: when scoring held-out docs against
    * a model trained elsewhere, unseen bigrams — the most surprising
    * transitions — contribute ppm 0 and count as novel, and stay in
    * n_bigrams. Docs with fewer than two tokens have no bigrams and
    * are absent — callers keep them with a left join.
    */
  def surprise(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docCnt = docs
      .select(col(idCol), explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col(idCol), col("bg"))
      .agg(count(lit(1)).as("cd"))
    docCnt.join(model, Seq("bg"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("cd")).as("n_bigrams"),
        sum(col("cd") * coalesce(expr("(1000000 * c12) div c1"), lit(0L)))
          .as("surprise_ppm"),
        sum(when(col("c12").isNull || col("cd") === col("c12"), col("cd"))
          .otherwise(lit(0L))).as("n_novel"))
  }
}
