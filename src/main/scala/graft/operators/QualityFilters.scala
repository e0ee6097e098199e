package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality filters for training-data pipelines: within-document
  * repetition statistics (the Gopher-style duplicate-n-gram signals),
  * PII scrubbing, and benchmark-contamination detection — the filter
  * stages that run between dedup and corpus assembly.
  *
  * Scale shape: repetition and contamination are per-document
  * aggregations over exploded n-grams — partial-agg shuffles keyed by
  * document, never all-pairs; the benchmark side of contamination is a
  * broadcast (eval sets are small by definition). PII scrubbing is a
  * pure Column projection that runs inside the scan.
  *
  * Cross-engine determinism: regexes restrict to ASCII classes whose
  * semantics agree between Java regex and RE2, fractions are a single
  * division of exact integer counts, and n-gram hashing reuses the
  * md5-derived [[Dedup.shingleHashes]] primitive.
  */
object QualityFilters {

  /** Dictionary-scale blocklist matching: match documents against a
    * PHRASE dictionary by joining exploded token n-grams per phrase
    * length — the formulation that scales to 100k-phrase blocklists
    * where `text RLIKE (p1|p2|…)` dies (one giant regex per row,
    * non-indexable, no pushdown). Matching is exact on the
    * case-folded token stream: a phrase of n tokens hits wherever the
    * doc's n-gram equals it.
    *
    * Output: per doc, total hits, distinct phrases hit, and the
    * sorted distinct phrase list (docs with no hits keep a 0/empty
    * row — the filter verdict needs every doc).
    *
    * Scale: one explode per DISTINCT PHRASE LENGTH present (lengths
    * are few and the explode rides the scan), each join keyed on the
    * n-gram string with the dictionary side broadcast below the
    * threshold. Never a regex union, never all-pairs.
    */
  def blocklistMatch(docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, phraseCol: String): DataFrame = {
    val ph = phrases
      .select(lower(trim(col(phraseCol))).as("__p"))
      .filter(col("__p") =!= "").distinct()
      .withColumn("__n", size(split(col("__p"), " ")))
    val lens = ph.select(col("__n")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(lower(col(textCol))).as("__t"))
    val hits = lens.map { n =>
      val grams =
        if (n == 1) toks.select(col("doc_id"), explode(col("__t")).as("__g"))
        else toks.select(col("doc_id"),
          explode(when(size(col("__t")) >= n,
            transform(sequence(lit(1), size(col("__t")) - (n - 1)),
              i => concat_ws(" ", slice(col("__t"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))).as("__g"))
      grams.join(broadcast(ph.filter(col("__n") === n)
          .select(col("__p").as("__g"))), Seq("__g"))
        .select(col("doc_id"), col("__g"))
    }.reduceOption[DataFrame](_ union _)
    val agg = hits
      .map(_.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"),
          size(array_sort(collect_set(col("__g")))).cast("long")
            .as("n_phrases"),
          array_join(array_sort(collect_set(col("__g"))), "|")
            .as("phrases_hit")))
      .getOrElse(
        // empty dictionary: no hit frame at all — verdict is all-clean
        toks.select(col("doc_id"), lit(0L).as("n_hits"),
          lit(0L).as("n_phrases"), lit("").as("phrases_hit"))
          .limit(0))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"),
        coalesce(col("phrases_hit"), lit("")).as("phrases_hit"))
      .withColumn("blocked", col("n_hits") > 0)
  }

  /** Per-document word n-gram repetition statistics: total and
    * distinct n-gram occurrence counts, the hottest n-gram's count,
    * and the two standard repetition signals derived from them —
    * `dup_ngram_frac` (fraction of occurrences that are repeats of an
    * already-seen n-gram) and `top_ngram_frac` (fraction claimed by
    * the single most frequent n-gram). High values of either mark
    * boilerplate / degenerate documents that repetition filters drop.
    *
    * Two partial-agg shuffles, both keyed by (doc, n-gram) then doc —
    * no global state, so the pass scales with the corpus. Documents
    * shorter than `n` tokens count their whole text as one n-gram
    * (the [[TextAnalysis.shingles]] convention).
    */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
        explode(graft.expressions.WordShingles.shinglesNative(
          col(textCol), n)).as("s"))
      .groupBy(col(idCol), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max(col("c")).as("top_count"))
      .select(col(idCol), col("total_ngrams"), col("distinct_ngrams"),
        col("top_count"),
        (lit(1.0) - col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double")).as("dup_ngram_frac"),
        (col("top_count").cast("double") /
          col("total_ngrams").cast("double")).as("top_ngram_frac"))

  /** Email/phone patterns shared verbatim with the DuckDB oracle.
    * ASCII-only classes; greedy quantifiers over disjoint classes, so
    * Java's leftmost-first and RE2's leftmost-longest matching pick
    * identical spans.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(phonePattern))

  /** Redact emails then phones (emails first: an email's local part
    * may itself contain a phone-shaped digit run, and the wider match
    * must win). Pure projection — runs at scan speed.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Benchmark contamination: for every corpus document, the fraction
    * of its DISTINCT word n-grams that also occur anywhere in the
    * benchmark corpus — the standard train/eval overlap check run
    * before training. Returns (id, n_ngrams, n_contaminated,
    * contamination).
    *
    * The benchmark's distinct n-gram hash set is broadcast (eval
    * benchmarks are tiny next to a 100 TB corpus); the corpus side is
    * one [[Dedup.shingleHashes]] pass plus a per-document count — a
    * broadcast hash join inside the scan, then one partial-agg
    * shuffle keyed by document. No corpus-side join shuffle.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusSh = Dedup.shingleHashes(corpus, idCol, textCol, n)
    val benchSh = Dedup.shingleHashes(benchmark, idCol, textCol, n)
      .select(col("h")).distinct()
    corpusSh
      .join(broadcast(benchSh.withColumn("hit", lit(1))), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        count(col("hit")).as("n_contaminated"))
      .select(col(idCol), col("n_ngrams"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_ngrams").cast("double")).as("contamination"))
  }

  /** The Gopher rule battery (Rae et al. 2021, "Scaling Language
    * Models" §A1.1): the published per-document quality heuristics a
    * crawl pipeline applies after dedup — all re-expressed as
    * integer-exact ppm so the whole battery hash-gates across
    * engines. ONE projection of array expressions (word and line
    * stats alike) — no explode, no shuffle; everything rides the
    * scan.
    *
    * Metrics (per doc, null text = empty):
    *  - n_words, mean_word_len_e2 (⌊100·Σlen/n⌋),
    *  - alpha_word_ppm   (words containing [A-Za-z]),
    *  - symbol_word_ppm  (# / "..." / … occurrences per word),
    *  - n_lines, bullet_line_ppm (lines starting - * •),
    *    ellipsis_line_ppm (lines ending "..." or …), dup_line_ppm
    *    (1 - distinct/total lines),
    *  - gopher_pass: the conjunction of the published thresholds
    *    (3 ≤ mean word length ≤ 10, ≥ 80% alphabetic words, symbol
    *    ratio < 10%, < 90% bullet lines, < 30% ellipsis lines,
    *    < 30% duplicate lines, ≥ 50 words).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val toks = TextAnalysis.tokens(txt)
    val nWords = size(toks).cast("long")
    val sumLen = coalesce(
      aggregate(transform(toks, w => length(w).cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L))
    val alphaWords = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val symbols = regexp_count(txt, lit("#|\\.\\.\\.|…")).cast("long")
    val lines = split(txt, "\n", -1)
    val nLines = size(lines).cast("long")
    val dl = size(array_distinct(lines)).cast("long")
    val bullet = size(filter(lines,
      ln => ln.rlike("^\\s*[-*•]"))).cast("long")
    val ellip = size(filter(lines,
      ln => ln.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    df.select(col(idCol), nWords.as("n_words"), sumLen.as("__sum_len"),
        alphaWords.as("__alpha"), symbols.as("__sym"),
        nLines.as("n_lines"), dl.as("__dl"), bullet.as("__bullet"),
        ellip.as("__ellip"))
      .select(col(idCol), col("n_words"),
        when(col("n_words") > 0,
          expr("(100 * __sum_len) div n_words")).otherwise(lit(0L))
          .as("mean_word_len_e2"),
        when(col("n_words") > 0,
          expr("(1000000 * __alpha) div n_words")).otherwise(lit(0L))
          .as("alpha_word_ppm"),
        when(col("n_words") > 0,
          expr("(1000000 * __sym) div n_words")).otherwise(lit(0L))
          .as("symbol_word_ppm"),
        col("n_lines"),
        expr("(1000000 * __bullet) div n_lines").as("bullet_line_ppm"),
        expr("(1000000 * __ellip) div n_lines").as("ellipsis_line_ppm"),
        expr("(1000000 * (n_lines - __dl)) div n_lines").as("dup_line_ppm"))
      .withColumn("gopher_pass",
        (col("n_words") >= 50 &&
          col("mean_word_len_e2").between(300L, 1000L) &&
          col("alpha_word_ppm") >= 800000L &&
          col("symbol_word_ppm") < 100000L &&
          col("bullet_line_ppm") < 900000L &&
          col("ellipsis_line_ppm") < 300000L &&
          col("dup_line_ppm") < 300000L).cast("boolean"))
  }

  /** The C4 rule battery (Raffel et al. 2020 §2.2): the published
    * crawl-cleaning heuristics — terminal-punctuation line ratio,
    * short-line ratio, sentence floor, curly-brace / "lorem ipsum"
    * page drops — companion to [[gopherRules]], same integer-exact
    * ppm discipline and same shuffle-free single-projection shape.
    *
    * Metrics per doc (null text = empty): n_lines,
    * term_punct_line_ppm (lines ending [.!?"]), short_line_ppm
    * (lines with < 5 words), n_sentences (terminal-punct count),
    * has_brace, has_lorem, and c4_keep = n_sentences >= 3 AND no
    * brace AND no lorem ipsum (the page-level drops; line-level
    * filtering is what the ppm columns feed).
    */
  def c4Rules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val lines = split(txt, "\n", -1)
    val nLines = size(lines).cast("long")
    val term = size(filter(lines,
      ln => ln.rlike("[.!?\"]\\s*$"))).cast("long")
    val short = size(filter(lines,
      ln => size(TextAnalysis.tokens(ln)) < 5)).cast("long")
    df.select(col(idCol),
        regexp_count(txt, lit("[.!?]")).cast("long").as("n_sentences"),
        txt.contains("{").as("has_brace"),
        lower(txt).contains("lorem ipsum").as("has_lorem"),
        nLines.as("n_lines"), term.as("__term"), short.as("__short"))
      .select(col(idCol), col("n_lines"),
        expr("(1000000 * __term) div n_lines").as("term_punct_line_ppm"),
        expr("(1000000 * __short) div n_lines").as("short_line_ppm"),
        col("n_sentences"), col("has_brace"), col("has_lorem"),
        (col("n_sentences") >= 3 && !col("has_brace") && !col("has_lorem"))
          .as("c4_keep"))
  }

  /** Train/serve distribution-drift audit (the log-free PSI stand-in):
    * bin a numeric feature with a fixed width on BOTH populations,
    * compare per-bin ppm shares, report |Δ| per bin and the total L1
    * distance (= 2× total-variation distance, in ppm) as a window
    * rollup. All-integer: shares by integral div, so the whole audit
    * hash-gates — classic PSI's log-ratio term can't. Bins absent on
    * one side read as 0 ppm (full-outer grid). Two partial-agg scans
    * + one bin-keyed join; the grid is range/width-bounded.
    */
  def binShareDrift(a: DataFrame, b: DataFrame, valCol: String,
      width: Long): DataFrame = {
    require(width >= 1)
    def counts(df: DataFrame) =
      df.select(floor(col(valCol) / width).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    shareDriftFromCounts(counts(a), counts(b))
  }

  /** [[binShareDrift]]'s comparison stage, public for STREAMING use:
    * takes the two (bin, c) count grids directly, so the serving-side
    * grid can come from a Complete-mode streaming aggregation (the
    * state is bin-bounded, never event-bounded) while the training
    * baseline is a static frame — the q306 pattern applied to drift
    * monitoring. Shares the exact integer share/L1 arithmetic with
    * the batch entry point so the two modes can never diverge.
    */
  def shareDriftFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def shares(df: DataFrame, out: String) =
      df.select(col("bin"), col("c").as("__c"))
        .withColumn(out, expr(
          "__c * 1000000L div sum(__c) OVER (PARTITION BY 1)"))
        .drop("__c")
    val w = Window.partitionBy(lit(1))
    shares(a, "share_a_ppm")
      .join(shares(b, "share_b_ppm"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("share_a_ppm"), lit(0L)).as("share_a_ppm"),
        coalesce(col("share_b_ppm"), lit(0L)).as("share_b_ppm"))
      .withColumn("abs_diff_ppm",
        abs(col("share_a_ppm") - col("share_b_ppm")))
      .withColumn("l1_total_ppm", sum(col("abs_diff_ppm")).over(w))
  }
}
