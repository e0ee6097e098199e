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
    // BOTH orders' counts off ONE text scan and ONE exchange (was:
    // two union-free branches, each re-scanning and re-tokenizing the
    // corpus through its own partial agg, each a one-task stage on an
    // under-split local source): tokens are projected once, the
    // order-tagged gram structs concatenate, and a single checkpoint
    // feeds the two size joins + two clipped joins per order. Gram
    // semantics unchanged: order 1 = [[TextAnalysis.tokens]] of the
    // lowered text; order 2 = "w1 w2" joins gated on size ≥ 2 (the
    // q215 lesson: sequence(1, 0) steps DOWNWARD, so the position
    // list is gated, never sliced). Spread first: tokenization + gram
    // explosion is the CPU-dense part (no-op at scale, guide §2.2).
    val base = Spread.byKey(
        docs.select(col(idCol).as("id"),
          lower(col(textCol)).as("__lt")), "id")
      .select(col("id"), TextAnalysis.tokens(col("__lt")).as("__toks"))
    val biGrams = when(size(col("__toks")) >= 2,
      transform(sequence(lit(1), size(col("__toks")) - 1),
        i => concat(element_at(col("__toks"), i), lit(" "),
          element_at(col("__toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val counts = base
      .select(col("id"), explode(concat(
        transform(col("__toks"),
          t => struct(lit(1).as("n"), t.as("g"))),
        transform(biGrams,
          g => struct(lit(2).as("n"), g.as("g"))))).as("x"))
      .select(col("id"), col("x.n").as("n"), col("x.g").as("g"))
      .groupBy(col("id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val uni = counts.filter(col("n") === 1)
      .select(col("id"), col("g"), col("c"))
    val bi = counts.filter(col("n") === 2)
      .select(col("id"), col("g"), col("c"))
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

  /** (id, n, g, c) word n-gram counts for orders 1..maxN in ONE long
    * frame off ONE corpus text scan: each order's gram list (order-1
    * = the case-folded tokens; higher orders the native
    * [[graft.operators.LanguageModel.ngramKeys]] shingles) is tagged
    * with its order and the concatenated list explodes through a
    * single partial agg + exchange. The union-of-branches form this
    * replaces re-scanned the text once per order and ran each branch
    * as its own exchange — and on an under-split local source each
    * branch was a ONE-task stage (maxN/32 cores busy); the frame is
    * [[Spread]] to the session's parallelism first since the
    * shingling itself is the CPU-dense part (no-op at scale).
    */
  private def orderCounts(docs: DataFrame, idCol: String,
      textCol: String, maxN: Int): DataFrame = {
    val perOrder: Seq[Column] = (1 to maxN).map { n =>
      val grams =
        if (n == 1) TextAnalysis.tokens(lower(col("__t")))
        else LanguageModel.ngramKeys(col("__t"), n)
      transform(grams, g => struct(lit(n).as("n"), g.as("g")))
    }
    Spread.byKey(
        docs.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .select(col("id"), explode(concat(perOrder: _*)).as("x"))
      .select(col("id"), col("x.n").as("n"), col("x.g").as("g"))
      .groupBy(col("id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
  }

  /** Pair-level BLEU in exact-integer LOG space (Papineni et al.
    * 2002), id_a the candidate and id_b the reference:
    *
    *   ln BLEU = ln BP + (1/k)·Σ_{n ≤ 4} ln p_n,
    *   p_n = clip_n / tot_n  (modified n-gram precision),
    *   ln BP = min(0, 1 − len_r/len_c)  (brevity penalty),
    *
    * emitted as signed ppm-nats — monotone in BLEU, so ranking and
    * thresholding behave identically, and every step is i64 algebra
    * that hash-gates cross-engine (exp would need a float): the
    * logarithms run the [[graft.functions.FixedPoint.lnPpm]] fold,
    * zero-clip orders take the standard +1 smoothing floor
    * (greatest(clip, 1)), orders the candidate is too short to
    * populate (tot_n = 0) drop out of the geometric mean (k counts
    * the populated orders — the sentence-BLEU convention), and a
    * zero-length candidate scores bp alone with k = 0.
    *
    * Output per pair: (id_a, id_b, len_c, len_r, clip1..clip4,
    * k_orders, bp_ppm, log_bleu_ppm).
    *
    * 100 TB shape: four (doc × distinct-gram) count frames ride the
    * text scan; clip joins are gram-keyed and bounded by the pair
    * list; the lnPpm folds run on the (pairs × 4)-row stats frame —
    * never on the corpus.
    */
  def bleuPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.FixedPoint
    import graft.functions.FixedPoint.idiv
    val counts = orderCounts(docs, idCol, textCol, 4)
      .localCheckpoint(true)
    val p = pairs.select(col("id_a"), col("id_b"))
    val tots = counts.groupBy(col("id"), col("n"))
      .agg(sum(col("c")).as("tot"))
    val a = counts.select(col("id").as("id_a"), col("n"), col("g"),
      col("c").as("ca"))
    val b = counts.select(col("id").as("id_b"), col("n"), col("g"),
      col("c").as("cb"))
    val clips = p.join(a, Seq("id_a")).join(b, Seq("id_b", "n", "g"))
      .groupBy(col("id_a"), col("id_b"), col("n"))
      .agg(sum(least(col("ca"), col("cb"))).as("clip"))
    // (pair × order) stats grid — the lnPpm fold runs here, bounded
    // by 4·|pairs| rows
    val grid = p.crossJoin(
        docs.sparkSession.range(1, 5).select(col("id").cast("int").as("n")))
      .join(tots.select(col("id").as("id_a"), col("n"),
        col("tot").as("tot_a")), Seq("id_a", "n"), "left")
      .join(tots.select(col("id").as("id_b"), col("n"),
        col("tot").as("tot_b")), Seq("id_b", "n"), "left")
      .join(clips, Seq("id_a", "id_b", "n"), "left")
      .withColumn("tot_a", coalesce(col("tot_a"), lit(0L)))
      .withColumn("tot_b", coalesce(col("tot_b"), lit(0L)))
      .withColumn("clip", coalesce(col("clip"), lit(0L)))
      .withColumn("nats", when(col("tot_a") >= 1,
        FixedPoint.lnPpm(col("tot_a"), greatest(col("clip"), lit(1L))))
        .otherwise(lit(0L)))
    def clipAt(n: Int) =
      sum(when(col("n") === n, col("clip")).otherwise(lit(0L)))
        .as(s"clip$n")
    val agg = grid.groupBy(col("id_a"), col("id_b"))
      .agg(
        sum(when(col("n") === 1, col("tot_a")).otherwise(lit(0L)))
          .as("len_c"),
        sum(when(col("n") === 1, col("tot_b")).otherwise(lit(0L)))
          .as("len_r"),
        clipAt(1), clipAt(2), clipAt(3), clipAt(4),
        sum(when(col("tot_a") >= 1, lit(1L)).otherwise(lit(0L)))
          .as("k_orders"),
        sum(col("nats")).as("__nats"))
    agg
      .withColumn("bp_ppm", when(col("len_c") >= col("len_r"), lit(0L))
        .otherwise(lit(1000000L) -
          idiv(col("len_r") * 1000000L, greatest(col("len_c"), lit(1L)))))
      .withColumn("log_bleu_ppm", col("bp_ppm") -
        when(col("k_orders") >= 1,
          idiv(col("__nats"), col("k_orders"))).otherwise(lit(0L)))
      .select(col("id_a"), col("id_b"), col("len_c"), col("len_r"),
        col("clip1"), col("clip2"), col("clip3"), col("clip4"),
        col("k_orders"), col("bp_ppm"), col("log_bleu_ppm"))
  }

  /** Pair-level chrF (Popović 2015) with β = 2, character n-grams of
    * orders 1..6 over the case-folded, whitespace-stripped text —
    * the translation-QA metric that needs no tokenizer, so it works
    * across scripts. Per order the F-score collapses to ONE exact
    * rational: with m = clipped matches, c = candidate grams, r =
    * reference grams,
    *
    *   F₂ = 5·P·R/(4P + R) = 5m/(4r + c)   (P = m/c, R = m/r),
    *
    * emitted as ppm by integral division — no float touches the
    * metric, so it hash-gates. chrf_ppm averages the per-order F over
    * orders where the pair has any grams (4r + c > 0); pairs of empty
    * texts score 0 with k_orders = 0.
    *
    * Output per pair: (id_a, id_b, k_orders, chrf_ppm).
    *
    * 100 TB shape: six (doc × distinct-gram) char-gram frames ride
    * one scan; clip joins gram-keyed, pair-bounded — identical
    * discipline to [[bleuPairs]] with characters for tokens.
    */
  def chrFPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.FixedPoint.idiv
    val maxN = 6
    val s = regexp_replace(lower(coalesce(col(textCol), lit(""))),
      "\\s+", "")
    // ONE pass over ONE stripped-text frame (was: six union branches,
    // each re-scanning and re-stripping the text through its own
    // exchange, each a one-task stage on an under-split local source
    // — 6/32 cores busy): the order index explodes from a literal
    // sequence, the gram list is built per (doc, n) with a
    // dynamic-length substr, and all six orders flow through a single
    // partial agg + exchange. Docs shorter than n produced an empty
    // gram array before; the length filter drops them identically.
    // sequence(1, 0) steps DOWNWARD (the q215 lesson) — gate on
    // length ≥ n, not on slice. Spread first: char-gram explosion is
    // the CPU-dense part (no-op at scale, guide §2.2).
    val counts = Spread.byKey(
        docs.select(col(idCol).as("id"), s.as("s")), "id")
      .select(col("id"), col("s"),
        explode(sequence(lit(1), lit(maxN))).as("n"))
      .filter(length(col("s")) >= col("n"))
      .select(col("id"), col("n"),
        explode(transform(
          sequence(lit(1), length(col("s")) - (col("n") - lit(1))),
          i => col("s").substr(i, col("n")))).as("g"))
      .groupBy(col("id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val p = pairs.select(col("id_a"), col("id_b"))
    val tots = counts.groupBy(col("id"), col("n"))
      .agg(sum(col("c")).as("tot"))
    val a = counts.select(col("id").as("id_a"), col("n"), col("g"),
      col("c").as("ca"))
    val b = counts.select(col("id").as("id_b"), col("n"), col("g"),
      col("c").as("cb"))
    val clips = p.join(a, Seq("id_a")).join(b, Seq("id_b", "n", "g"))
      .groupBy(col("id_a"), col("id_b"), col("n"))
      .agg(sum(least(col("ca"), col("cb"))).as("clip"))
    val grid = p.crossJoin(
        docs.sparkSession.range(1, maxN + 1)
          .select(col("id").cast("int").as("n")))
      .join(tots.select(col("id").as("id_a"), col("n"),
        col("tot").as("tot_a")), Seq("id_a", "n"), "left")
      .join(tots.select(col("id").as("id_b"), col("n"),
        col("tot").as("tot_b")), Seq("id_b", "n"), "left")
      .join(clips, Seq("id_a", "id_b", "n"), "left")
      .withColumn("tot_a", coalesce(col("tot_a"), lit(0L)))
      .withColumn("tot_b", coalesce(col("tot_b"), lit(0L)))
      .withColumn("clip", coalesce(col("clip"), lit(0L)))
      .withColumn("__den", col("tot_b") * 4L + col("tot_a"))
      .withColumn("__f", when(col("__den") > 0,
        idiv(col("clip") * 5000000L, col("__den"))).otherwise(lit(0L)))
    grid.groupBy(col("id_a"), col("id_b"))
      .agg(
        sum(when(col("__den") > 0, lit(1L)).otherwise(lit(0L)))
          .as("k_orders"),
        sum(col("__f")).as("__fsum"))
      .withColumn("chrf_ppm", when(col("k_orders") >= 1,
        idiv(col("__fsum"), col("k_orders"))).otherwise(lit(0L)))
      .select(col("id_a"), col("id_b"), col("k_orders"), col("chrf_ppm"))
  }
}
