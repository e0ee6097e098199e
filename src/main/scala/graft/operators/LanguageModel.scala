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
  def bigramKeys(textCol: Column): Column = ngramKeys(textCol, 2)

  /** Case-folded "w1 … wn" n-gram key strings via the native one-pass
    * [[graft.expressions.WordShingles]], with the whole-text fallback
    * guarded off: documents with fewer than n tokens yield NO n-grams.
    */
  def ngramKeys(textCol: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(textCol)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(graft.expressions.WordShingles.shinglesNative(textCol, n))
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

  /** Corpus unigram counts over the case-folded whitespace tokens:
    * (w, cu). Vocabulary-bounded after one partial-agg shuffle.
    */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))

  /** Corpus bigram LIFT (the exp-PMI association measure): for each
    * bigram with c12 >= minCount occurrences,
    *   lift_ppm = ⌊1e6 · c12 · N / (c1 · c2)⌋
    * where c1/c2 are the words' unigram occurrence counts and N the
    * corpus token total — the ratio p(w1 w2)/(p(w1)p(w2)) whose log
    * is PMI; monotone in PMI, so rankings agree while staying
    * integer-exact. High-lift pairs are the corpus' collocations
    * (named entities, technical terms) — the phrase-mining /
    * tokenizer-merge-candidate signal.
    *
    * 100 TB shape: two vocabulary-bounded count tables joined on word
    * keys, the token-total scalar on a one-row broadcast. The i64
    * product 1e6·c12·N bounds the exact range to c12·N < 2^63/1e6
    * (~9e12) — beyond that, swap the expression to DECIMAL(38,0);
    * the plan shape is unchanged.
    */
  def bigramLift(docs: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    val uni = unigramCounts(docs, textCol)
    val tot = uni.agg(sum(col("cu")).as("n_total"))
    docs.select(explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_ppm",
        expr("(1000000 * c12 * n_total) div (c1 * c2)"))
      .select(col("bg"), col("c12"), col("c1"), col("c2"), col("lift_ppm"))
  }

  /** Per-document interpolated trigram-LM score — the higher-order
    * analog of [[surprise]] (Jelinek–Mercer interpolation with fixed
    * integer weights): each trigram occurrence scores
    *   interp_ppm = (5·p3 + 3·p2 + 2·p1) div 10, where
    *   p3 = ppm(c123 / c12)  — trigram MLE given the "w1 w2" context,
    *   p2 = ppm(c23  / c(w2)) — bigram  MLE given w2,
    *   p1 = ppm(c(w3) / N)    — unigram prior,
    * all as integer parts-per-million so partial-agg order can't
    * perturb the gate. Unseen components coalesce to 0 — the unigram
    * floor keeps scores nonzero for any in-vocabulary w3, exactly the
    * role of interpolation in LM smoothing.
    *
    * 100 TB shape: three model tables — trigram, bigram, unigram
    * counts — are all vocabulary-bounded partial aggs; scoring joins
    * each doc's DISTINCT trigrams (pre-aggregated multiplicity `cd`)
    * against them on string keys, and the total-token scalar rides a
    * ONE-ROW broadcast (the q125 pattern — the only way to attach a
    * corpus scalar without a shuffle).
    *
    * Output one row per input doc (docs with < 3 tokens carry zeros):
    * (idCol, n_trigrams, interp_ppm_sum, min_interp_ppm).
    */
  def trigramInterpolated(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val uni = unigramCounts(docs, textCol)
    val tot = uni.agg(sum(col("cu")).as("n_total"))
    val bg = docs.select(explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val triKeys = ngramKeys(col(textCol), 3)
    val docTri = docs.select(col(idCol).as("__doc"), explode(triKeys).as("tg"))
      .groupBy(col("__doc"), col("tg")).agg(count(lit(1)).as("cd"))
    // the global trigram model re-aggregates the (doc, tg, cd) frame —
    // one corpus explode total, not two; identical counts
    val tri = docTri.groupBy(col("tg")).agg(sum(col("cd")).as("c123"))
    // tokens contain no spaces, so the "w1 w2 w3" key splits losslessly
    val scored = docTri
      .join(tri, Seq("tg"), "left")
      .withColumn("w12", substring_index(col("tg"), " ", 2))
      .withColumn("w23", substring_index(col("tg"), " ", -2))
      .withColumn("w2", substring_index(col("w23"), " ", 1))
      .withColumn("w3", substring_index(col("tg"), " ", -1))
      .join(bg.select(col("bg").as("w12"), col("cb").as("c12")),
        Seq("w12"), "left")
      .join(bg.select(col("bg").as("w23"), col("cb").as("c23")),
        Seq("w23"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("cu2")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("cu").as("cu3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("interp_ppm", expr(
        """(5 * coalesce((1000000 * c123) div c12, 0L)
          | + 3 * coalesce((1000000 * c23) div cu2, 0L)
          | + 2 * coalesce((1000000 * cu3) div n_total, 0L)) div 10"""
          .stripMargin))
    val perDoc = scored.groupBy(col("__doc"))
      .agg(sum(col("cd")).as("n_trigrams"),
        sum(col("cd") * col("interp_ppm")).as("interp_ppm_sum"),
        min(col("interp_ppm")).as("min_interp_ppm"))
    docs.select(col(idCol).as("__doc"))
      .join(perDoc, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("interp_ppm_sum"), lit(0L)).as("interp_ppm_sum"),
        coalesce(col("min_interp_ppm"), lit(0L)).as("min_interp_ppm"))
  }

  /** Char-trigram language profiles (the fastText/langid.py feature
    * family, trained not hand-written like [[TextAnalysis.langId]]'s
    * stopword heuristic): per label, the topM character trigrams of
    * the lowercased training text by occurrence count, ties broken by
    * gram string. The profile table is labels×topM rows — broadcast
    * material at any corpus size; the label-keyed rank window is
    * vocabulary-bounded, never data-bounded.
    */
  def charTrigramProfiles(docs: DataFrame, labelCol: String,
      textCol: String, topM: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topM >= 1, s"topM must be >= 1, got $topM")
    val grams = docs
      .select(col(labelCol).as("label"),
        lower(coalesce(col(textCol), lit(""))).as("__s"))
      .select(col("label"), explode(expr(
        """CASE WHEN length(__s) >= 3
          |  THEN transform(sequence(1, length(__s) - 2),
          |         i -> substring(__s, i, 3))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
        .as("gram"))
    grams.groupBy(col("label"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rank") <= topM)
  }

  /** Classify by profile overlap: score(doc, label) = |distinct doc
    * trigrams ∩ profile(label)|, prediction = argmax score with ties
    * to the lexicographically smallest label (the min-struct trick:
    * min(struct(−score, label)) — one partial agg, no window over
    * data). Docs whose trigrams hit NO profile are absent — the
    * caller left-joins and defaults. 100 TB: profiles broadcast; the
    * only shuffles are the (doc,label) and doc partial aggs.
    */
  def classifyByProfiles(docs: DataFrame, idCol: String,
      textCol: String, profiles: DataFrame): DataFrame = {
    val docGrams = docs
      .select(col(idCol).as("__id"),
        lower(coalesce(col(textCol), lit(""))).as("__s"))
      .select(col("__id"), explode(expr(
        """CASE WHEN length(__s) >= 3
          |  THEN transform(sequence(1, length(__s) - 2),
          |         i -> substring(__s, i, 3))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
        .as("gram"))
      .distinct()
    docGrams
      .join(broadcast(profiles.select(col("label"), col("gram"))),
        Seq("gram"))
      .groupBy(col("__id"), col("label"))
      .agg(count(lit(1)).as("score"))
      .groupBy(col("__id"))
      .agg(min(struct((-col("score")).as("ns"), col("label").as("l")))
        .as("best"))
      .select(col("__id").as(idCol), col("best.l").as("pred"),
        (-col("best.ns")).as("score"))
  }

  /** Positive-PMI collocation mining over the corpus bigram space —
    * the classic "which word pairs co-occur far above chance" readout
    * (Church & Hanks 1990), in EXACT integer parts-per-million so the
    * full ranking hash-gates. Marginals live in the bigram event
    * space (head h(w1)=Σ_w2 c12, tail t(w2)=Σ_w1 c12, N=Σ c12), and
    * the log factors through the identity
    *   ln(N·c12/(h·t)) = lnPpm(N, h) − lnPpm(t, c12)
    * — BOTH ratios ≥ 1 (h ≤ N, c12 ≤ t) and both numerators under
    * [[graft.functions.FixedPoint.lnPpm]]'s 2^33 contract (N and t,
    * never their product), which a direct ln(N·c12/(h·t)) would blow
    * through immediately. Filters: c12 ≥ minCount (rare-pair PMI is
    * noise), PMI > 0; top `k` by (pmi_ppm desc, bigram asc).
    *
    * Scale shape: one bigram partial agg (vocabulary²-bounded output,
    * map-side combined), two vocabulary-sized marginal aggs joined
    * back on their keys, the 1-row N via broadcast — no data-sized
    * shuffle beyond the bigram count itself.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    import graft.functions.FixedPoint.lnPpm
    val bg = docs
      .select(explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("c12"))
    val heads = bg.groupBy(substring_index(col("bg"), " ", 1).as("__w1"))
      .agg(sum(col("c12")).as("h1"))
    val tails = bg.groupBy(substring_index(col("bg"), " ", -1).as("__w2"))
      .agg(sum(col("c12")).as("t2"))
    val n = bg.agg(sum(col("c12")).as("n_bigrams"))
    bg.filter(col("c12") >= minCount)
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .withColumn("__w2", substring_index(col("bg"), " ", -1))
      .join(heads, "__w1")
      .join(tails, "__w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi_ppm",
        lnPpm(col("n_bigrams"), col("h1")) - lnPpm(col("t2"), col("c12")))
      .filter(col("pmi_ppm") > 0)
      .select(col("bg"), col("c12"), col("h1"), col("t2"), col("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("bg"))
      .limit(k)
  }

  /** Shannon entropy of the token distribution per group (source), in
    * integer ppm-nats: H = Σ_t (c_t/N)·ln(N/c_t), computed as
    * (Σ_t c_t·lnPpm(N, c_t)) div N — every ratio ≥ 1, every term an
    * i64, so the corpus-diversity dashboard hash-gates exactly. Also
    * emits n_tokens and n_distinct (the entropy's ceiling is
    * ln(n_distinct) — reporting both makes the readout
    * interpretable). Per-(group, token) partial agg → vocabulary-
    * bounded lnPpm projection → one group rollup; nothing data-sized
    * past the first agg.
    */
  def tokenEntropy(docs: DataFrame, grpCol: String,
      textCol: String): DataFrame = {
    import graft.functions.FixedPoint.{idiv, lnPpm}
    val cnt = docs
      .select(col(grpCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"))
    cnt.join(broadcast(tot), "grp") // group-cardinality-bounded side
      .withColumn("__term", col("c") * lnPpm(col("n_tokens"), col("c")))
      .groupBy(col("grp"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("n_distinct")).as("n_distinct"),
        sum(col("__term")).as("__sum"))
      .withColumn("entropy_ppm", idiv(col("__sum"), col("n_tokens")))
      .select(col("grp"), col("n_tokens"), col("n_distinct"),
        col("entropy_ppm"))
  }

  /** Dunning log-likelihood keyness (G², Dunning 1993) of each token
    * in the `focus` group against the rest of the corpus — the
    * corpus-linguistics "what is this source ABOUT" operator — in
    * EXACT integer ppm. With a = focus count, b = reference count,
    * A/B the group token totals, each log factors through the
    * overflow-safe identities
    *   ln(a/E_a) = lnPpm(A+B, A) − lnPpm(a+b, a)
    *   ln(b/E_b) = lnPpm(A+B, B) − lnPpm(a+b, b)
    * (every ratio ≥ 1, every numerator inside the 2^33 contract), and
    * G²_ppm = 2·(a·ln(a/E_a) + b·ln(b/E_b)). Zero counts contribute
    * zero (the 0·ln 0 limit) and never reach a division. Reported:
    * tokens OVERREPRESENTED in focus (a/A ≥ b/B by truncating ppm
    * compare — deterministic cross-engine), top `k` by (g2 desc,
    * token asc). Contract: focus must be a proper subset (B > 0).
    *
    * Scale shape: one (token) partial agg with the focus flag summed
    * in-pass (no second scan for the reference side), totals on a
    * 1-row broadcast, the lnPpm folds on the vocabulary-sized frame.
    */
  def keyness(docs: DataFrame, grpCol: String, textCol: String,
      focus: String, minCount: Long, k: Int): DataFrame = {
    import graft.functions.FixedPoint.{idiv, lnPpm}
    val tok = docs.select(
      when(col(grpCol) === focus, 1L).otherwise(0L).as("__f"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
    val cnt = tok.groupBy(col("t"))
      .agg(sum(col("__f")).as("a"),
        (count(lit(1)) - sum(col("__f"))).as("b"))
    val tot = cnt.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    cnt.filter(col("a") + col("b") >= minCount)
      .crossJoin(broadcast(tot))
      .withColumn("__ta", when(col("a") > 0,
        col("a") * (lnPpm(col("na") + col("nb"), col("na")) -
          lnPpm(col("a") + col("b"), col("a")))).otherwise(0L))
      .withColumn("__tb", when(col("b") > 0,
        col("b") * (lnPpm(col("na") + col("nb"), col("nb")) -
          lnPpm(col("a") + col("b"), col("b")))).otherwise(0L))
      .withColumn("g2_ppm", (col("__ta") + col("__tb")) * 2L)
      .filter(idiv(col("a") * 1000000L, col("na")) >=
        idiv(col("b") * 1000000L, col("nb")))
      .select(col("t").as("token"), col("a"), col("b"), col("g2_ppm"))
      .orderBy(col("g2_ppm").desc, col("token"))
      .limit(k)
  }

  /** Gini coefficient of the token-frequency distribution per group —
    * the vocabulary-inequality readout (a natural-corpus Zipf profile
    * runs ~0.8+; near-uniform synthetic text much lower), EXACT by
    * the rank formula over ascending counts:
    *   G_num = 2·Σ i·c_(i) − (V+1)·N,  gini_ppm = G_num·1e6 div (V·N)
    * with ties rank-ordered by (count, token) — a total order, so
    * both engines assign identical ranks. One (grp, token) partial
    * agg, then a per-group window over the VOCABULARY frame.
    */
  def tokenGini(docs: DataFrame, grpCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.FixedPoint.idiv
    val cnt = docs
      .select(col(grpCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c"), col("t"))
    cnt
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("v_distinct"),
        sum(col("c")).as("n_tokens"),
        sum(col("__i") * col("c")).as("__ic"))
      .withColumn("gini_ppm", idiv(
        (col("__ic") * 2L - (col("v_distinct") + 1L) * col("n_tokens")) *
          1000000L,
        col("v_distinct") * col("n_tokens")))
      .select(col("grp"), col("v_distinct"), col("n_tokens"),
        col("gini_ppm"))
  }

  /** Zipf power-law fit per group: the least-squares slope of
    * ln freq against ln rank over the group's rank-frequency table —
    * the corpus statistic scaling-law work reads off a corpus (a
    * healthy natural-language source sits near s ≈ 1; a synthetic or
    * template-heavy source drifts far from it). Exact-integer
    * end-to-end: ln values come from the fixed-point kernel in MILLI
    * units (ppm div 1000 — caps every per-row cross-product at ~5e8
    * so the i64 SUMS never overflow at any vocabulary size; the
    * slope's sum-of-sums products sx·sy / n·sxy can still exceed i64
    * near 10^6 distinct tokens, so those are formed in decimal(38,0)
    * — exact, and mirrored by HUGEINT in the oracle), and the MAGNITUDE
    * is emitted (slope is negative by construction; keeping operands
    * positive sidesteps the truncate-vs-floor divide divergence on
    * negatives between engines). Rank ties break (count desc, token
    * asc) — total.
    *
    * One vocab partial agg + one per-group vocab-sized rank window +
    * one group-row readout — [[tokenGini]]'s exact shape.
    */
  def zipfFit(docs: DataFrame, grpCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.FixedPoint
    import graft.functions.FixedPoint.idiv
    val cnt = docs
      .select(col(grpCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c").desc, col("t"))
    cnt
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__x", idiv(FixedPoint.lnPpm(col("__r"), lit(1L)),
        lit(1000L)))
      .withColumn("__y", idiv(FixedPoint.lnPpm(col("c"), lit(1L)),
        lit(1000L)))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("v_distinct"),
        sum(col("c")).as("n_tokens"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      // decimal(38,0) keeps these exact past the ~10^6-distinct-token
      // point where the i64 products sx·sy / n·sxy / sx² would wrap
      .withColumn("__num",
        col("__sx").cast("decimal(38,0)") * col("__sy") -
          col("v_distinct").cast("decimal(38,0)") * col("__sxy"))
      .withColumn("__den",
        col("v_distinct").cast("decimal(38,0)") * col("__sxx") -
          col("__sx").cast("decimal(38,0)") * col("__sx"))
      // explicit sign × positive division: Spark div truncates while
      // DuckDB // floors, so a negative operand would diverge; a
      // single-token vocabulary has zero x-variance → slope 0
      .withColumn("zipf_s_ppm",
        when(col("__den") === 0L, lit(0L)).otherwise(
          when(col("__num") < 0L, lit(-1L)).otherwise(lit(1L)) *
            idiv(abs(col("__num")) * 1000000L, col("__den"))))
      .select(col("grp"), col("v_distinct"), col("n_tokens"),
        col("zipf_s_ppm"))
  }

  /** Interpolated Kneser–Ney bigram model (the KenLM/CCNet smoothing,
    * Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.25 at order 2) with
    * a fixed absolute discount D given in ppm:
    *
    *   p_KN(w2|w1) = max(c12 − D, 0)/c1
    *               + (D·N1+(w1 ·)/c1) · N1+(· w2)/N1+(· ·)
    *
    * where N1+(w1 ·) counts distinct continuations of w1, N1+(· w2)
    * counts distinct histories of w2 (the continuation probability —
    * KN's defining idea: "York" is frequent but follows almost only
    * "New", so it backs off poorly), and N1+(· ·) is the number of
    * distinct bigram types. Everything is exact-integer ppm:
    *
    *   kn_ppm = (10^6·c12 − D_ppm) div c1            [c12 ≥ 1 ⇒ ≥ 0]
    *          + ((D_ppm·N1+(w1 ·)) div c1 · pcont_ppm) div 10^6,
    *   pcont_ppm = (10^6·N1+(· w2)) div N1+(· ·),
    *
    * so the model hash-gates cross-engine (i64 bounds: the largest
    * product is D_ppm·N1+ ≤ 10^6·|V|). Output: one row per bigram
    * type — (bg, c12, c1, n1p_head, n1p_tail, kn_ppm) — vocabulary-
    * bounded; the discounted-mass identity Σ_w2 p(w2|w1) = 1 holds in
    * the rational algebra and the spec pins its ppm-rounded form.
    *
    * 100 TB shape: one corpus bigram explode → (bg) partial agg; the
    * head/tail/type statistics are three aggs over the DISTINCT-
    * bigram frame (vocabulary-sized, never corpus-sized); the type
    * total rides a 1-row broadcast.
    */
  def knBigramModel(docs: DataFrame, textCol: String,
      dPpm: Long): DataFrame = {
    require(dPpm >= 0 && dPpm < 1000000L,
      s"discount must be a ppm in [0, 1e6), got $dPpm")
    import graft.functions.FixedPoint.idiv
    val bg = docs
      .select(explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      // heads/tails/type-count each re-aggregate this frame — compute
      // the corpus explode ONCE
      .localCheckpoint(true)
    val heads = bg.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"),
        count(lit(1)).as("n1p_head"))
    val tails = bg.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_tail"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    bg
      .join(heads, Seq("w1"))
      .join(tails, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("__pcont_ppm",
        idiv(col("n1p_tail") * 1000000L, col("n_types")))
      .withColumn("kn_ppm",
        idiv(col("c12") * 1000000L - dPpm, col("c1")) +
          idiv(idiv(lit(dPpm) * col("n1p_head"), col("c1")) *
            col("__pcont_ppm"), lit(1000000L)))
      .select(col("bg"), col("c12"), col("c1"), col("n1p_head"),
        col("n1p_tail"), col("kn_ppm"))
  }

  /** MODIFIED Kneser–Ney bigram model (Chen & Goodman 1999 §4.1.6 —
    * the variant KenLM actually ships): three count-class discounts
    * estimated FROM THE DATA's count-of-counts instead of one fixed
    * D, with the back-off weight redistributing exactly the
    * discounted mass:
    *
    *   Y  = n1/(n1 + 2·n2)
    *   D1 = 1 − 2Y·n2/n1,  D2 = 2 − 3Y·n3/n2,  D3+ = 3 − 4Y·n4/n3
    *   p(w2|w1) = (c12 − D(c12))/c1 + γ(w1)·pcont(w2)
    *   γ(w1) = (D1·N1(w1·) + D2·N2(w1·) + D3+·N3+(w1·))/c1
    *
    * where n_k counts bigram TYPES with count exactly k and N_k(w1·)
    * counts w1's continuations in count class k. Everything is exact
    * ppm integers: the four count-of-counts ride ONE agg over the
    * distinct-bigram frame to a 1-row broadcast (the q125 scalar
    * pattern), each discount clamps to [0, k·10^6] (the estimator can
    * leave the valid range on skewed count histograms; the clamp
    * keeps every discounted numerator non-negative), and the
    * discounted-mass identity Σ_w2 p(w2|w1) = 1 holds in the rational
    * algebra by construction. Output schema matches [[knBigramModel]]
    * — (bg, c12, c1, n1p_head, n1p_tail, kn_ppm) — so [[knSurprise]]
    * scores against either.
    */
  def knBigramModelModified(docs: DataFrame, textCol: String): DataFrame = {
    import graft.functions.FixedPoint.idiv
    val bg = docs
      .select(explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .localCheckpoint(true)
    val heads = bg.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"),
        count(lit(1)).as("n1p_head"),
        sum(when(col("c12") === 1, 1L).otherwise(0L)).as("nh1"),
        sum(when(col("c12") === 2, 1L).otherwise(0L)).as("nh2"),
        sum(when(col("c12") >= 3, 1L).otherwise(0L)).as("nh3"))
    val tails = bg.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_tail"))
    val scalars = bg.agg(
        count(lit(1)).as("n_types"),
        sum(when(col("c12") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c12") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("c12") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("c12") === 4, 1L).otherwise(0L)).as("n4"))
      .withColumn("y_ppm",
        idiv(col("n1") * 1000000L,
          greatest(col("n1") + col("n2") * 2L, lit(1L))))
      .withColumn("d1_ppm", greatest(lit(0L), least(lit(1000000L),
        lit(1000000L) -
          idiv(lit(2L) * col("y_ppm") * col("n2"), greatest(col("n1"), lit(1L))))))
      .withColumn("d2_ppm", greatest(lit(0L), least(lit(2000000L),
        lit(2000000L) -
          idiv(lit(3L) * col("y_ppm") * col("n3"), greatest(col("n2"), lit(1L))))))
      .withColumn("d3_ppm", greatest(lit(0L), least(lit(3000000L),
        lit(3000000L) -
          idiv(lit(4L) * col("y_ppm") * col("n4"), greatest(col("n3"), lit(1L))))))
    bg
      .join(heads, Seq("w1"))
      .join(tails, Seq("w2"))
      .crossJoin(broadcast(scalars))
      .withColumn("__d", when(col("c12") === 1, col("d1_ppm"))
        .when(col("c12") === 2, col("d2_ppm")).otherwise(col("d3_ppm")))
      .withColumn("__pcont_ppm",
        idiv(col("n1p_tail") * 1000000L, col("n_types")))
      .withColumn("__gamma_ppm",
        idiv(col("d1_ppm") * col("nh1") + col("d2_ppm") * col("nh2") +
          col("d3_ppm") * col("nh3"), col("c1")))
      .withColumn("kn_ppm",
        idiv(greatest(col("c12") * 1000000L - col("__d"), lit(0L)),
          col("c1")) +
          idiv(col("__gamma_ppm") * col("__pcont_ppm"), lit(1000000L)))
      .select(col("bg"), col("c12"), col("c1"), col("n1p_head"),
        col("n1p_tail"), col("kn_ppm"))
  }

  /** Per-document Kneser–Ney surprisal against a [[knBigramModel]]:
    * each doc aggregates n_bigrams, Σ kn_ppm over occurrences, and
    * Σ −ln p in ppm-nats (the summed negative log-likelihood —
    * divide by n_bigrams for per-token entropy, the CCNet/KenLM
    * quality signal). The log runs through the fixed-point
    * [[graft.functions.FixedPoint.lnPpm]] fold ON THE MODEL FRAME
    * (vocabulary-bounded — the corpus path only joins the finished
    * integer), with p floored at 1 ppm so a heavily-discounted rare
    * bigram can't hit ln(1/0). Unseen bigrams (held-out scoring)
    * coalesce to that same 1 ppm floor — the most-surprising bucket.
    * Docs with < 2 tokens emit zeros.
    */
  def knSurprise(docs: DataFrame, model: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.FixedPoint
    val m = model
      .withColumn("__p", greatest(col("kn_ppm"), lit(1L)))
      .withColumn("__nats_ppm", FixedPoint.lnPpm(lit(1000000L), col("__p")))
      .select(col("bg"), col("kn_ppm"), col("__nats_ppm"))
    val docCnt = docs
      .select(col(idCol).as("__doc"), explode(bigramKeys(col(textCol))).as("bg"))
      .groupBy(col("__doc"), col("bg"))
      .agg(count(lit(1)).as("cd"))
    val perDoc = docCnt.join(m, Seq("bg"), "left")
      .groupBy(col("__doc"))
      .agg(sum(col("cd")).as("n_bigrams"),
        sum(col("cd") * coalesce(col("kn_ppm"), lit(0L))).as("kn_ppm_sum"),
        sum(col("cd") * coalesce(col("__nats_ppm"),
          FixedPoint.lnPpm(lit(1000000L), lit(1L)))).as("kn_nats_sum"))
    docs.select(col(idCol).as("__doc"))
      .join(perDoc, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_ppm_sum"), lit(0L)).as("kn_ppm_sum"),
        coalesce(col("kn_nats_sum"), lit(0L)).as("kn_nats_sum"))
  }
}
