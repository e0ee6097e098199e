package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a weighted vocabulary — the
  * tokenizer-induction step of a training-data pipeline (Sennrich et
  * al. 2016: repeatedly merge the most frequent adjacent symbol
  * pair). Deterministic end-to-end: the argmax tiebreak is total
  * (count desc, then left/right lexicographic) and the merge apply is
  * a plain left-to-right non-overlapping string replace, so every
  * round — and the final symbolization — is oracle-reproducible.
  *
  * 100 TB shape: training runs over the WORD VOCABULARY (word, count),
  * not the corpus — the corpus-sized work is the one word-count
  * partial agg that produces the vocab (q40's path). Each round is a
  * vocabulary-bounded pair-count partial agg plus a 1-row argmax
  * readout (the Similarity.kmeansIterate iterative-trainer pattern);
  * the merge apply is a pure projection.
  *
  * Symbol-string encoding: symbols joined with TWO spaces, one space
  * at each end (` a  b  c `). Symbols never contain spaces, so the
  * pair (l, r) occurs iff the string ` l  r ` occurs, and replacing
  * it with ` lr ` merges leftmost-first without consuming the shared
  * delimiter of an adjacent match — ` a  b  a  b ` merges BOTH pairs
  * in one pass, while overlapping ` a  a  a ` merges only the first,
  * exactly the reference BPE greedy order.
  */
object Bpe {

  /** Initial symbolization: one symbol per character. */
  def initSymbols(wordCol: Column): Column =
    concat(lit(" "), regexp_replace(wordCol, "(.)", "$1  "))

  /** Adjacent-pair counts weighted by word count — reuses
    * [[LanguageModel.bigrams]] over the symbol array.
    */
  def pairCounts(words: DataFrame, symCol: String, cntCol: String): DataFrame =
    words
      .select(col(cntCol).as("cnt"),
        explode(LanguageModel.bigrams(split(trim(col(symCol)), "\\s+")))
          .as("bg"))
      .groupBy(col("bg.w1").as("left"), col("bg.w2").as("right"))
      .agg(sum(col("cnt")).as("pair_cnt"))

  /** The round's winning pair: a deterministic 1-row readout. */
  def bestPair(pairs: DataFrame): Option[(String, String, Long)] =
    pairs.orderBy(col("pair_cnt").desc, col("left"), col("right"))
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** Apply one merge: ` l  r ` → ` lr ` (non-regex replace). */
  def applyMerge(words: DataFrame, symCol: String, left: String,
      right: String): DataFrame =
    words.withColumn(symCol,
      call_function("replace", col(symCol),
        lit(s" $left  $right "), lit(s" $left$right ")))

  /** GPT-2-style pretokenization pattern, RE2-portable: contractions
    * first (leftmost-FIRST alternation — Java regex and RE2 agree),
    * then space-prefixed letter runs, digit runs, punctuation runs,
    * then whitespace remainder. This is the ASCII approximation of
    * the GPT-2 pattern (its `\p{L}`/`\p{N}` classes and the trailing
    * `\s+(?!\S)` lookahead are dropped — RE2 has no lookahead; the
    * corpus here is ASCII, and the space-prefix convention — the
    * pattern's actual point, space travels WITH the following word so
    * "the" and " the" are distinct tokenizer symbols — is preserved
    * exactly).
    */
  val pretokenizePat: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"

  /** Pretokenize lowercased text into GPT-2-style pretokens — the
    * step real BPE tokenizers run BEFORE merges (whitespace-word BPE
    * over-merges across punctuation and loses the space-prefix
    * distinction). Pure projection riding the scan; feeds
    * [[train]]/[[encodeByVocab]] as the word stream.
    */
  def pretokenize(text: Column): Column =
    regexp_extract_all(lower(coalesce(text, lit(""))),
      lit(pretokenizePat), lit(0))

  /** Tokenizer INFERENCE at corpus scale: encode documents against a
    * trained symbolization by joining each token to the (word → sym)
    * vocabulary — broadcast, since the vocab is bounded — never by
    * re-running the merge replaces per occurrence. Emits per-doc
    * n_tokens and n_subwords; tokens absent from the vocabulary cost
    * their character count (the BPE char-level fallback).
    */
  def encodeByVocab(docs: DataFrame, idCol: String, textCol: String,
      symbolized: DataFrame, wordCol: String = "word"): DataFrame = {
    val pieces = symbolized.select(col(wordCol).as("__w"),
      size(split(trim(col("sym")), "\\s+")).as("__n_sym"))
    docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__w"))
      .join(broadcast(pieces), Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__n_sym").cast("long"),
          length(col("__w")).cast("long"))).as("n_subwords"))
  }

  /** Lineage is truncated every this-many rounds: each merge chains a
    * withColumn replace onto the plan AND each round's pair-count agg
    * re-analyzes the whole chain, so an unbroken lineage makes
    * planning cost O(rounds²). localCheckpoint materializes the
    * symbolized vocab (vocabulary-sized, bounded) and resets the
    * chain.
    */
  private val CheckpointEvery = 8

  /** `rounds` merges over a (word, count) vocabulary. Returns the
    * symbolized vocabulary (extra `sym` column) and the merge table
    * in application order. Stops early if no pair remains.
    */
  def train(vocab: DataFrame, wordCol: String, cntCol: String,
      rounds: Int): (DataFrame, Seq[(String, String, Long)]) = {
    var words = vocab.select(col(wordCol), col(cntCol),
      initSymbols(col(wordCol)).as("sym"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      bestPair(pairCounts(words, "sym", cntCol)) match {
        case Some((l, rt, c)) =>
          merges += ((l, rt, c))
          words = applyMerge(words, "sym", l, rt)
          if ((r + 1) % CheckpointEvery == 0) words = words.localCheckpoint()
        case None => exhausted = true
      }
      r += 1
    }
    (words, merges.toSeq)
  }

  /** BPE-DROPOUT (Provilkov et al. 2020, ACL) made replayable: the
    * trained merge chain is re-applied to the vocabulary, but merge
    * `i` is SKIPPED for word `w` when the salted hash of
    * `(word, i, salt)` falls below `dropPpm` — dropping a merge
    * leaves that pair split, and every later merge cascades over the
    * dropped string exactly as in the reference algorithm. Different
    * salts give independent subword-regularization samples, each a
    * pure function of (word, salt), so samples hash-gate in SQL
    * (the [[UnigramLm.sampleSegment]] discipline applied to the BPE
    * family). Granularity note: the drop is per (word, merge) — all
    * occurrences of the pair inside one word drop together — the
    * deterministic-distributed variant of the paper's per-occurrence
    * coin flips.
    *
    * Cost: `merges.size` conditional replaces over the VOCABULARY —
    * a projection chain, no aggregation; corpus-scale encode then
    * rides the same broadcast word→pieces join as [[encodeByVocab]].
    */
  def dropoutSymbolize(vocab: DataFrame, wordCol: String,
      merges: Seq[(String, String)], salt: String,
      dropPpm: Long): DataFrame = {
    require(dropPpm >= 0 && dropPpm <= 1000000L)
    var cur = vocab.withColumn("sym_drop", initSymbols(col(wordCol)))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val h = conv(substring(md5(concat(col(wordCol),
        lit(s":$i:$salt"))), 1, 15), 16, 10).cast("long")
      cur = cur.withColumn("sym_drop",
        when(h % 1000000L < dropPpm, col("sym_drop"))
          .otherwise(call_function("replace", col("sym_drop"),
            lit(s" $l  $r "), lit(s" $l$r "))))
      if ((i + 1) % CheckpointEvery == 0) cur = cur.localCheckpoint()
    }
    cur
  }

  /** Character-n-gram vocabulary induction for [[greedyEncode]]:
    * every substring of length 1..maxPieceLen of every DISTINCT word,
    * weighted by corpus word count, top-M by (weight desc, piece asc)
    * — a total order, so the cut at M is deterministic. All work is
    * vocabulary-bounded (distinct words × ≤ len·maxPieceLen pieces);
    * only the M winning pieces reach the driver.
    */
  def charNgramVocab(vocab: DataFrame, wordCol: String, cntCol: String,
      maxPieceLen: Int, topM: Int): Seq[String] = {
    vocab
      .select(col(wordCol).as("__w"), col(cntCol).as("__c"),
        length(col(wordCol)).as("__len"))
      // empty words contribute no pieces: sequence(1, 0) defaults its
      // step to -1 and yields [1, 0], whose pos=0 row would survive
      // the bounds filter at l=1 and emit a weighted empty piece
      .filter(col("__len") >= 1)
      .select(col("__w"), col("__c"), col("__len"),
        explode(sequence(lit(1), col("__len"))).as("__pos"))
      .select(col("__w"), col("__c"), col("__len"), col("__pos"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .filter(col("__pos") + col("__l") - 1 <= col("__len"))
      .select(substring(col("__w"), col("__pos"), col("__l")).as("piece"),
        col("__c"))
      .groupBy(col("piece")).agg(sum(col("__c")).as("__t"))
      .orderBy(col("__t").desc, col("piece")).limit(topM)
      .collect().map(_.getString(0)).toSeq
  }

  /** Greedy longest-match subword encode — the WordPiece INFERENCE
    * path (longest vocabulary piece first, single-char advance + unk
    * on a miss), run as a bounded state machine over the
    * DISTINCT-words table, not the corpus: Zipf makes distinct words
    * orders of magnitude smaller than corpus tokens, so the per-word
    * fold (`steps` iterations × maxPieceLen probes against a literal
    * vocab array) rides a vocabulary-sized scan and per-DOC stats are
    * one broadcast join away ([[encodeByVocab]]'s shape). Words
    * needing more than `steps` pieces/misses encode only the prefix
    * reachable in `steps` state transitions (each match consumes up
    * to maxPieceLen characters, so the budget bounds piece COUNT, not
    * character count) — both engines run the identical step count, so
    * the gate is exact. Adds (n_pieces, n_unk) to the input rows.
    */
  def greedyEncode(vocab: DataFrame, wordCol: String,
      vocabPieces: Seq[String], maxPieceLen: Int = 4,
      steps: Int = 16): DataFrame = {
    require(maxPieceLen >= 1 && steps >= 1)
    // a piece longer than maxPieceLen would silently never match (the
    // probe ladder only tries lengths 1..maxPieceLen) — degraded
    // encodes with no error, so fail fast instead
    require(vocabPieces.forall(_.length <= maxPieceLen),
      s"vocab contains pieces longer than maxPieceLen=$maxPieceLen: " +
        vocabPieces.filter(_.length > maxPieceLen).take(3).mkString(", "))
    val vl = typedLit(vocabPieces)
    val w = col(wordCol)
    val len = length(w)
    val fold = aggregate(
      sequence(lit(1), lit(steps)),
      struct(lit(1).as("pos"), lit(0).as("np"), lit(0).as("unk")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val np = acc.getField("np")
        val unk = acc.getField("unk")
        def matchSt(l: Int) = struct((pos + l).as("pos"),
          (np + 1).as("np"), unk.as("unk"))
        val missSt = struct((pos + 1).as("pos"), np.as("np"),
          (unk + 1).as("unk"))
        val l1 = when(array_contains(vl, substring(w, pos, lit(1))),
          matchSt(1)).otherwise(missSt)
        val matched = (maxPieceLen to 2 by -1).foldRight(l1) { (l, els) =>
          when((len - pos >= l - 1) &&
              array_contains(vl, substring(w, pos, lit(l))),
            matchSt(l)).otherwise(els)
        }
        when(pos > len, acc).otherwise(matched)
      })
    vocab.withColumn("__st", fold)
      .withColumn("n_pieces", col("__st.np").cast("long"))
      .withColumn("n_unk", col("__st.unk").cast("long"))
      .drop("__st")
  }
}
