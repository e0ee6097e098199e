package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted index and keyword search over the corpus — the retrieval
  * side of a training-data pipeline (contamination auditing, targeted
  * subset extraction, "which documents mention X").
  *
  * 100 TB shape: the term-frequency frame is one explode + one
  * partial-agg shuffle keyed by (token, doc); the index rollup is a
  * second partial agg keyed by token (vocabulary-bounded output).
  * Search never scans text — it filters the tf frame on the query
  * terms (a scan-pruned predicate) and aggregates per doc; the
  * per-term slice is tiny, so the plan is a few partial aggs, never a
  * corpus-wide sort.
  */
object Search {

  /** (token, doc_id, tf) — the posting-source frame both the index
    * and every search derive from.
    */
  def termFrequencies(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Index rollup: per token, document frequency, total term
    * frequency, and the top-`k` postings sorted tf-descending with
    * doc-ascending tiebreak (deterministic shard shape). The sort key
    * encodes tf negated so one ascending sort_array yields the order.
    */
  def invertedIndex(tf: DataFrame, k: Int): DataFrame =
    tf.groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        slice(array_sort(collect_list(
            struct((-col("tf")).as("ntf"), col("doc_id")))), 1, k)
          .as("sorted"))
      .withColumn("top_postings",
        transform(col("sorted"), s =>
          struct(col("token"), (-s.getField("ntf")).as("tf"),
            s.getField("doc_id"))))
      .drop("sorted")

  /** Conjunctive keyword search: docs containing ALL `terms`, scored
    * by summed tf (integer — deterministic), ranked score-desc with
    * doc-asc tiebreak, top `k`.
    */
  def searchAll(tf: DataFrame, terms: Seq[String], k: Int): DataFrame =
    tf.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("tf")).as("score"))
      .filter(col("n_matched") === terms.distinct.size)
      .drop("n_matched")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Posting-list compression accounting: per token, the byte cost of
    * the doc-id list stored raw (8 bytes/id) vs delta-encoded with
    * LEB128 varints — the storage decision every inverted index makes
    * (gaps between SORTED doc ids are small for frequent terms, so
    * dense lists compress hardest). Gap varint width is the exact
    * integer ⌈bits/7⌉ via range cases; the first posting stores its
    * absolute id. Returns (token, df, raw_bytes, varint_bytes,
    * savings_ppm), all exact integers.
    *
    * One lag window per token partition (vocabulary-keyed — the
    * shuffle axis is the term, never the corpus) + one token rollup.
    */
  def postingCompression(tf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    // exact LEB128 width ⌈bits/7⌉ over the full non-negative long
    // range: 60-bit hash doc ids (used as ids elsewhere in this repo)
    // take 9 bytes; a negative long (out of contract, but a gap never
    // is one) would need the 10-byte max, the final otherwise
    def varintBytes(c: Column): Column =
      when(c < (1L << 7), 1L).when(c < (1L << 14), 2L)
        .when(c < (1L << 21), 3L).when(c < (1L << 28), 4L)
        .when(c < (1L << 35), 5L).when(c < (1L << 42), 6L)
        .when(c < (1L << 49), 7L).when(c < (1L << 56), 8L)
        .when(c >= 0L, 9L).otherwise(10L)
    tf.select(col("token"), col("doc_id"))
      .withColumn("__gap",
        col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w),
          lit(0L)))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(varintBytes(col("__gap"))).as("varint_bytes"))
      .withColumn("raw_bytes", col("df") * 8L)
      .withColumn("savings_ppm",
        expr("(raw_bytes - varint_bytes) * 1000000L div raw_bytes"))
      .select(col("token"), col("df"), col("raw_bytes"),
        col("varint_bytes"), col("savings_ppm"))
  }

  /** (doc_id, pos, token) — positional postings, the index layout
    * phrase and proximity queries need. One posexplode; downstream
    * consumers filter on token FIRST, so the per-term slices that
    * actually move through joins are vocabulary-selective, never the
    * whole corpus.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token"))

  /** Exact phrase search over positional postings: an n-token phrase
    * matches where token i sits at `start + i` for every i — the
    * classic positional-index adjacency chain, expressed as n−1
    * equi-joins on (doc_id, normalized start). Returns per-doc phrase
    * frequency, ranked tf-desc / doc-asc, top `k`.
    *
    * Scale: each join leg is the postings frame FILTERED to one term
    * before shuffling (token predicate reaches the scan), and every
    * join is keyed (doc_id, pos) — co-partitioned after the first
    * shuffle, so the chain adds no re-shuffles. Overlapping matches
    * count separately ("a a a" contains "a a" twice), matching the
    * standard positional-index semantics.
    */
  def phraseSearch(postings: DataFrame, phrase: Seq[String],
      k: Int): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val first = postings.filter(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(postings.filter(col("token") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id"))
      .limit(k)
  }

  /** Best-snippet selection: for each candidate doc, the `window`-token
    * span covering the MOST DISTINCT query terms, ties to the earliest
    * start. Returns (doc_id, snip_pos, n_terms) — the highlighting
    * anchor a result page needs.
    *
    * Every span considered starts at a query-term hit (a span that
    * starts mid-gap is dominated by the same span snapped right), so
    * the search space is hits × hits-within-window, both frames
    * ALREADY filtered to query terms — per-doc work is O(hits²/doc)
    * worst case but hit lists are term-selective slices, never the
    * corpus. collect_set over a pos-range window keeps the distinct
    * count engine-exact (integers, no approximation).
    */
  def bestSnippet(postings: DataFrame, terms: Seq[String],
      window: Int): DataFrame = {
    require(terms.nonEmpty && window >= 1)
    import org.apache.spark.sql.expressions.Window
    val hits = postings.filter(col("token").isin(terms: _*))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rangeBetween(0, window - 1)
    hits
      .withColumn("n_terms",
        size(collect_set(col("token")).over(w)).cast("long"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("n_terms").desc, col("pos"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("pos").as("snip_pos"), col("n_terms"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    * the standard hybrid-retrieval combiner (keyword × vector): each
    * list contributes 1/(kRrf + rank) for the docs it ranked, summed
    * across lists. Integer-deterministic: contributions ride as
    * `1000000 div (kRrf + rank)` parts-per-million (positive-operand
    * truncation, identical in Spark `div` and DuckDB `//`), so the
    * fused ranking is oracle-gateable.
    *
    * Inputs: frames of (doc_id, rank) with rank 1-based. 100 TB
    * shape: each input is already a top-k (bounded); the fuse is a
    * union + one partial agg on doc_id — never corpus-sized.
    */
  def rrfFuse(ranked: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(ranked.nonEmpty)
    ranked
      .map(_.select(col("doc_id"),
        (lit(1000000L) / (lit(kRrf) + col("rank"))).cast("long")
          .as("contrib")))
      .reduce(_ union _)
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_ppm"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 ranking (Robertson/Spärck Jones, the +1 idf variant that
    * keeps scores positive): disjunctive match over `terms`,
    *   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)).
    * Float math — ranking semantics are spec-gated on planted
    * fixtures; the integer paths above are the oracle-gated surface.
    * Doc length and avgdl are computed from the tf frame itself; the
    * two tiny per-corpus scalars ride in via a broadcast cross join.
    */
  def bm25(tf: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docLen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val matched = tf.filter(col("token").isin(terms: _*))
    val df = matched.groupBy(col("token")).agg(count(lit(1)).as("df"))
    matched
      .join(broadcast(df), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("tf_part",
        col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("idf") * col("tf_part")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** [[bm25]] in EXACT integer parts-per-million — the hash-gateable
    * form (the q405 nDCG fixed-point discipline): every term of the
    * score is an i64 expression both engines compute identically, so
    * the full ranking — not just its shape — oracle-gates.
    *
    *  - idf: ln((N−df+0.5)/(df+0.5)+1) = ln((2N+2)/(2df+1)), an
    *    integer-ratio log taken in ppm by
    *    [[graft.functions.FixedPoint.lnPpm]] (shift-and-square
    *    fixed-point log2, truncation identical cross-engine);
    *  - tf part: with the standard k1=1.2=6/5, b=0.75=3/4 cleared to
    *    integers against avgdl=L/N, tf·(k1+1)/(tf+k1(1−b+b·dl/avgdl))
    *    = 22·L·tf / (10·L·tf + 3·L + 9·dl·N) — one truncating div in
    *    ppm;
    *  - per-term contribution: idf_ppm·tfpart_ppm div 1e6, summed per
    *    doc.
    *
    * Overflow contract: 22e6·L·tf must fit i64 (corpus token count ×
    * max per-doc tf < 4·10¹¹ — holds to ~billion-token corpora);
    * beyond that, and for float-exact scores, [[bm25]] is the API.
    * Plan shape is identical to [[bm25]]: two broadcast joins + one
    * doc-keyed partial agg; the fixed-point folds run on the
    * vocabulary-sized df frame.
    */
  def bm25Ppm(tf: DataFrame, terms: Seq[String], k: Int): DataFrame =
    bm25PpmScores(tf, terms)
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)

  /** [[bm25Ppm]] without the final order/limit — every matched doc's
    * score, for callers that aggregate scores further instead of
    * taking a global top-k (the q493 max-p passage rollup scores at
    * PASSAGE grain and must not sort the passage frame globally).
    */
  def bm25PpmScores(tf: DataFrame, terms: Seq[String]): DataFrame = {
    import graft.functions.FixedPoint.{idiv, lnPpm}
    val docLen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("len_total"))
    val matched = tf.filter(col("token").isin(terms: _*))
    val dfq = matched.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = dfq.crossJoin(broadcast(corpus))
      .withColumn("idf_ppm",
        lnPpm(col("n_docs") * 2L + 2L, col("df") * 2L + 1L))
      .select(col("token"), col("idf_ppm"))
    matched
      .join(broadcast(idf), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("tfpart_ppm",
        idiv(lit(22000000L) * col("len_total") * col("tf"),
          col("len_total") * col("tf") * 10L + col("len_total") * 3L +
            col("dl") * col("n_docs") * 9L))
      .withColumn("contrib",
        idiv(col("idf_ppm") * col("tfpart_ppm"), lit(1000000L)))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score_ppm"))
  }

  /** Top-k terms per group by raw term frequency (ties to the
    * lexicographically smaller term) — the per-source vocabulary
    * signature behind corpus drift dashboards. One (group, term)
    * partial agg, then a per-group window over the ALREADY-aggregated
    * frame: the window input is vocabulary-bounded, never the corpus.
    */
  /** ONE definition of the case-folded (key, term, tf) stage — shared
    * by [[topTermsPerGroup]] and [[keywordsPerDoc]] so the tokenizer
    * convention can never drift between them.
    */
  private def loweredTf(df: DataFrame, keyCol: String,
      textCol: String): DataFrame =
    df.select(col(keyCol).as("__key"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("__key"), col("term")).agg(count(lit(1)).as("tf"))

  def topTermsPerGroup(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("tf").desc, col("term"))
    loweredTf(df, groupCol, textCol).withColumnRenamed("__key", "grp")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-document keyword extraction: top-k terms by the integer
    * TF-IDF surrogate ⌊1e6·tf/df⌋ (df = docs containing the term).
    * The corpus doc count N of the textbook tf·N/df is CONSTANT
    * across every term, so dropping it preserves the exact ranking
    * while keeping the i64 product bounded by 1e6·tf — overflow-free
    * at any corpus size. Ties to the lexicographically smaller term.
    * The auto-tagging / snippet-labeling primitive.
    *
    * df is a vocabulary-bounded partial agg joined back on the term
    * key; the rank window partitions by document (bounded by per-doc
    * vocabulary).
    */
  def keywordsPerDoc(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = loweredTf(docs, idCol, textCol)
    val dfreq = terms.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("score_ppm").desc, col("term"))
    terms.join(dfreq, Seq("term"))
      .withColumn("score_ppm", expr("(1000000 * tf) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__key").as(idCol), col("rank"), col("term"),
        col("tf"), col("df"), col("score_ppm"))
  }

  /** Sparse tf-weighted cosine similarity join over the inverted
    * index — the LEXICAL near-dup/similarity complement to the
    * embedding ANN family: two documents are similar when their
    * tf vectors align, computed EXACTLY in integers so the verdict
    * hash-gates. cos² cross-multiplies away both square roots:
    *   cos²·1e6 = (Σ tf_a·tf_b)² · 1e6  div  (Σ tf_a²)·(Σ tf_b²)
    * — monotone in cosine (dots are non-negative), so thresholds and
    * rankings carry over at fixed ppm precision.
    *
    * Scale shape (the DAAT discipline): candidate pairs come ONLY
    * from co-occurrence in a posting list, and ubiquitous terms are
    * df-capped (`maxDf`) before pairing — the stop-word lists that
    * would quadratically explode candidates carry ~zero cosine
    * weight, the same reason winnowNearDupCandidates caps df. Per
    * pair the dot is one partial agg keyed (id_a, id_b); norms are a
    * doc-keyed agg joined back. Overflow: dot²·1e6 must fit i64 —
    * dot < 3·10⁶ (per-pair shared-token tf mass), checked by the
    * norm bound Σtf² ≤ dl·max_tf.
    */
  def sparseCosineJoin(tf: DataFrame, maxDf: Int,
      minCos2Ppm: Long): DataFrame = {
    import graft.functions.FixedPoint.idiv
    val capped = tf.join(
      tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf),
      Seq("token"))
    // norms over the SAME capped feature space as the dot — the
    // cosine is exact IN THAT SPACE (standard stop-term pruning);
    // mixing capped dots with full-vector norms would silently
    // underestimate every pair that shares a pruned token
    val norms = capped.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("norm2"))
    val a = capped.select(col("token"), col("doc_id").as("id_a"),
      col("tf").as("__tfa"))
    val b = capped.select(col("token"), col("doc_id").as("id_b"),
      col("tf").as("__tfb"))
    a.join(b, Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__tfa") * col("__tfb")).as("dot"),
        count(lit(1)).as("n_shared"))
      .join(norms.select(col("doc_id").as("id_a"),
        col("norm2").as("norm2_a")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"),
        col("norm2").as("norm2_b")), "id_b")
      .withColumn("cos2_ppm", idiv(col("dot") * col("dot") * 1000000L,
        col("norm2_a") * col("norm2_b")))
      .filter(col("cos2_ppm") >= minCos2Ppm)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("dot"),
        col("norm2_a"), col("norm2_b"), col("cos2_ppm"))
  }

  /** ASYMMETRIC containment join over token sets — the quote/subset
    * detector Jaccard can't express: J(A,B) = |A∩B|/|A∪B| scores a
    * short document quoted inside a long one near ZERO, while
    * containment C(A→B) = |A∩B|/|A| scores it 1. Emits BOTH
    * directions per pair (cont_a = how much of A is inside B,
    * cont_b = the reverse), keeping pairs where EITHER direction
    * clears the threshold — the training-data use cases are "doc B
    * embeds doc A" (drop A) and "A is a boilerplate superset" (flag
    * A). Integer-exact: counts and ppm divisions only.
    *
    * Same DAAT discipline and capped-space consistency rule as
    * [[sparseCosineJoin]]: candidates only from df-capped posting
    * co-occurrence, and the |A| / |B| set sizes are measured in the
    * SAME capped space as the intersection — mixing a capped
    * intersection with full-vocabulary sizes would underestimate
    * containment for every document sharing a pruned token.
    */
  def containmentJoin(tf: DataFrame, maxDf: Int,
      minContPpm: Long): DataFrame = {
    import graft.functions.FixedPoint.idiv
    val capped = tf.join(
      tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf),
      Seq("token"))
    val sizes = capped.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    val a = capped.select(col("token"), col("doc_id").as("id_a"))
    val b = capped.select(col("token"), col("doc_id").as("id_b"))
    a.join(b, Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc_id").as("id_a"),
        col("n_tokens").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"),
        col("n_tokens").as("n_b")), "id_b")
      .withColumn("cont_a_ppm", idiv(col("n_shared") * 1000000L, col("n_a")))
      .withColumn("cont_b_ppm", idiv(col("n_shared") * 1000000L, col("n_b")))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= minContPpm)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("cont_a_ppm"), col("cont_b_ppm"))
  }

  /** Deterministic hash token embedding for [[maxSimTopK]]: component
    * i = hash60("token:i‖salt") % 21 − 10 — a pure function of the
    * token string, so both engines derive the identical integer
    * vector from the same md5 formula (the clustered-fixture
    * discipline applied to token space).
    */
  def hashTokenVector(token: Column, dim: Int, salt: String): Column =
    transform(sequence(lit(1), lit(dim)), i =>
      (graft.operators.GraphAnn.saltedHash60(
        concat(token, lit(":"), i.cast("string")), salt) % 21 - 10)
        .cast("int"))

  /** ColBERT-style late-interaction re-ranking (Khattab & Zaharia
    * 2020's MaxSim): score(q, d) = Σ_{t ∈ q} max_{u ∈ d} ⟨v_t, v_u⟩
    * over per-token vectors — the middle ground between one-vector
    * dense retrieval (loses token granularity) and cross-encoders
    * (can't precompute). Token vectors here are the deterministic
    * [[hashTokenVector]] integers so the whole ranking hash-gates;
    * swapping in learned embeddings changes no plan shape.
    *
    * `queries` is (qid, token) exploded. Candidates = docs sharing at
    * least one exact query token (the lexical gate a production
    * system replaces with per-token ANN); scoring touches each
    * candidate's DISTINCT tokens once per query token. Query tokens
    * absent from the corpus vocabulary contribute nothing (max over
    * an empty set = no row — the left-join default 0 keeps the sum
    * honest). Top-k per qid by (score desc, doc asc).
    *
    * 100 TB shape: the token-vector frame is vocabulary-bounded and
    * built once; candidates arise from a posting equi-join (never
    * all-docs); per-candidate work is |doc vocab| × |q| integer dots
    * with the query side broadcast.
    */
  def maxSimTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, dim: Int, salt: String, k: Int): DataFrame = {
    val (docTok, tokv, q, qv) = maxSimFrames(docs, idCol, textCol,
      queries, dim, salt)
    val cand = docTok.join(broadcast(q.select(col("qid"), col("token"))),
        Seq("token"))
      .select(col("qid"), col("doc_id")).distinct()
    maxSimCore(docTok, tokv, qv, cand, k)
  }

  /** [[maxSimTopK]] with an EXTERNAL token-embedding table — the
    * "swap learned embeddings in with zero plan change" claim, made
    * a gate (q506): `tokenVecs` is any (token string, tv array<int>)
    * frame — in production the parquet a trained encoder exported —
    * and the serve is the SAME posting-gated join/score core; the
    * only plan delta is a parquet scan where the hash projection
    * stood. Tokens absent from the table score nothing (the OOV
    * contract, identical to query tokens missing from the corpus
    * vocabulary). No checkpoint on the external frame: it is already
    * storage, and the scan keeps column pruning/pushdown.
    */
  def maxSimTopKExternal(docs: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, tokenVecs: DataFrame,
      k: Int): DataFrame = {
    val docTok = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .distinct()
    val tokv = tokenVecs.select(col("token"), col("tv"))
    val q = queries.select(col("qid"), lower(col("token")).as("token"))
      .distinct()
    val qv = q.join(tokv, Seq("token"))
      .select(col("qid"), col("token").as("qtoken"), col("tv").as("qv"))
    val cand = docTok.join(broadcast(q), Seq("token"))
      .select(col("qid"), col("doc_id")).distinct()
    maxSimCore(docTok, tokv, qv, cand, k)
  }

  /** [[maxSimTopK]] over an EXPLICIT candidate list (qid, doc_id) —
    * the re-rank stage of a two-stage retrieval: a dense (or ANN)
    * shortlist feeds in, MaxSim re-scores it with token granularity
    * (q499's composition). Same scoring core as the posting-gated
    * form.
    */
  def maxSimRerank(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, candidates: DataFrame, dim: Int,
      salt: String, k: Int): DataFrame = {
    val (docTok, tokv, _, qv) = maxSimFrames(docs, idCol, textCol,
      queries, dim, salt)
    maxSimCore(docTok, tokv, qv,
      candidates.select(col("qid"), col("doc_id")), k)
  }

  private def maxSimFrames(docs: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, dim: Int, salt: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docTok = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .distinct()
    val tokv = docTok.select(col("token")).distinct()
      .withColumn("tv", hashTokenVector(col("token"), dim, salt))
      .localCheckpoint(true)
    val q = queries.select(col("qid"), lower(col("token")).as("token"))
      .distinct()
    val qv = q.join(tokv, Seq("token"))
      .select(col("qid"), col("token").as("qtoken"), col("tv").as("qv"))
    (docTok, tokv, q, qv)
  }

  private def maxSimCore(docTok: DataFrame, tokv: DataFrame,
      qv: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.VectorExpressions.dotI
    cand
      .join(docTok, Seq("doc_id"))
      .join(tokv, Seq("token"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("__dot", dotI(col("qv"), col("tv")))
      .groupBy(col("qid"), col("doc_id"), col("qtoken"))
      .agg(max(col("__dot")).as("__best"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("__best")).as("maxsim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("maxsim").desc, col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn").cast("long").as("rn"),
        col("doc_id"), col("maxsim"))
  }
}
