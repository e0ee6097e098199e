package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedPoint

/** Unigram-language-model (SentencePiece-style) tokenizer training —
  * the third tokenizer family next to BPE merge training
  * ([[Bpe.train]], reference q107) and WordPiece greedy inference
  * ([[Bpe.greedyEncode]], q215): seed a piece vocabulary from
  * weighted substrings, then alternate Viterbi (hard-EM) rounds —
  * E-step: segment every word into its minimum-cost piece sequence
  * under the current piece costs; M-step: re-estimate piece costs
  * from the chosen-segmentation counts (Kudo 2018, arXiv:1804.10959,
  * with the expectation step hardened to the single best path so
  * every round is exactly replayable).
  *
  * Deterministic end-to-end, hence oracle-gateable: piece costs are
  * integer −ln p in ppm via the [[FixedPoint.lnPpm]] shift-and-square
  * kernel, the Viterbi DP breaks cost ties toward the LONGER piece
  * (total order), pruning cuts on (count desc, piece asc), and
  * Laplace (+1) smoothing keeps every surviving piece scorable.
  * Single-character pieces are never pruned, so segmentation coverage
  * is total by construction and the DP needs no unk path.
  *
  * 100 TB shape: everything runs over the WORD VOCABULARY
  * (word, count) — the corpus-sized work is the one word-count
  * partial agg that produces it (q40's path). The E-step is a pure
  * per-row fold (zero shuffles, one vocabulary-sized scan); the
  * M-step is a vocabulary-bounded partial agg; the only driver
  * traffic is the piece table (≤ singles + topM rows) once per round
  * — the [[Similarity.kmeansSummary]] iterative-trainer pattern.
  * Corpus-scale ENCODE then rides a broadcast word→pieces join
  * ([[Bpe.encodeByVocab]]'s shape), never a per-occurrence DP.
  *
  * Contract: words longer than `maxWordLen` are excluded from
  * training (the max-sentence-length clip every SentencePiece run
  * applies); total piece weight must stay < 2^33 (the lnPpm i64
  * contract — beyond that, shard the M-step and sum).
  */
object UnigramLm {

  /** Unreachable-cell cost sentinel. Real path costs are ≤
    * maxWordLen · lnPpm_max ≈ 10 · 2.3e7; 1e12 dominates while
    * maxWordLen · Inf still fits i64 comfortably.
    */
  private val Inf = 1000000000000L

  /** Seed piece pool: every substring of length 1..maxPieceLen of
    * every distinct word, weighted by corpus word count — the same
    * induction as [[Bpe.charNgramVocab]] but kept as a DataFrame
    * (piece, w) because the EM loop re-derives counts each round.
    */
  def seedPieces(vocab: DataFrame, wordCol: String, cntCol: String,
      maxPieceLen: Int): DataFrame =
    vocab
      .select(col(wordCol).as("__w"), col(cntCol).as("__c"),
        length(col(wordCol)).as("__len"))
      .filter(col("__len") >= 1)
      .select(col("__w"), col("__c"), col("__len"),
        explode(sequence(lit(1), col("__len"))).as("__pos"))
      .select(col("__w"), col("__c"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("__len") - col("__pos") + 1)))
          .as("__l"), col("__pos"))
      .select(col("__w").substr(col("__pos"), col("__l")).as("piece"),
        col("__c"))
      .groupBy(col("piece")).agg(sum(col("__c")).as("w"))

  /** Prune to the working vocabulary: ALL single-character pieces
    * (coverage guarantee) plus the top-M multi-character pieces by
    * (weight desc, piece asc) — a total order, so the cut is
    * deterministic.
    */
  def prunePieces(pieces: DataFrame, topM: Int): DataFrame = {
    val singles = pieces.filter(length(col("piece")) === 1)
    val multis = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("w").desc, col("piece")).limit(topM)
    singles.unionByName(multis)
  }

  /** Viterbi segmentation of every word under literal piece costs —
    * one per-row DP fold, zero shuffles. dp[pos] = min over piece
    * lengths l of dp[pos−l] + cost(word[pos−l+1..pos]); ties prefer
    * the longer piece (l iterated descending, strict '<' to replace).
    * Adds `pieces` (the chosen segments, left to right), `n_pieces`,
    * and `cost` (the path total in ppm). Caller guarantees every word
    * has 1 ≤ length ≤ maxWordLen and single-char coverage (true for
    * any [[prunePieces]] output over the same corpus).
    *
    * CALLER CONTRACT: truncate `words`' lineage (localCheckpoint)
    * when it derives from a corpus-sized plan — the fold is a plain
    * projection, so every trainer action otherwise re-derives the
    * corpus aggregation beneath it and the optimizer can end up
    * evaluating the interpreted fold against pre-aggregation volume
    * (measured: 2m32s → 15s at sf0.1 for one train once the
    * 31-row vocabulary was checkpointed).
    */
  def viterbiSegment(words: DataFrame, wordCol: String,
      costs: Seq[(String, Long)], maxPieceLen: Int,
      maxWordLen: Int): DataFrame =
    viterbiCore(words, wordCol, costs, maxPieceLen, maxWordLen, None)

  /** Subword-REGULARIZATION sampling (Kudo 2018 §3, made replayable):
    * instead of drawing a segmentation from P(seg|word) with RNG
    * state, every piece OCCURRENCE's cost is perturbed by a salted
    * hash of (word, end position, piece, salt) modulo `jitterPpm`
    * and the SAME Viterbi DP picks the min-perturbed-cost path — the
    * Gumbel/perturb-and-MAP trick with a hash in place of the Gumbel
    * draw. The sampled path is a pure function of (word, salt):
    * different salts give independent segmentation samples of the
    * same word (the data-augmentation epochs subword regularization
    * exists for), and every sample replays in SQL verbatim.
    * `jitterPpm` is the temperature knob: 0 degenerates to the
    * 1-best path; values comparable to the cost gaps between
    * competing paths flip them with hash-uniform probability.
    *
    * The emitted `cost` is the TRUE (unperturbed) path cost of the
    * sampled segmentation — recomputed from the chosen pieces — so
    * downstream perplexity readouts stay honest; `cost_perturbed`
    * is the DP objective that selected it.
    */
  def sampleSegment(words: DataFrame, wordCol: String,
      costs: Seq[(String, Long)], maxPieceLen: Int, maxWordLen: Int,
      salt: String, jitterPpm: Long): DataFrame = {
    require(jitterPpm >= 0)
    val costMap = typedLit(costs.toMap)
    // jitterPpm == 0 IS the documented degenerate case (the 1-best
    // path) — `h % 0` would divide by zero, so route it to the
    // unperturbed DP explicitly
    val out = viterbiCore(words, wordCol, costs, maxPieceLen,
      maxWordLen, if (jitterPpm == 0) None else Some((salt, jitterPpm)))
    out
      .withColumn("cost_perturbed", col("cost"))
      .withColumn("cost",
        aggregate(col("pieces"), lit(0L),
          (acc, p) => acc + coalesce(element_at(costMap, p), lit(Inf))))
  }

  /** EXACT n-best segmentation (Kudo 2018's other sampling surface:
    * the top-n lattice paths, VERDICT r11 item 7): the same piece
    * lattice as [[viterbiSegment]], with each DP cell widened from
    * the single best arrival to the n best (cost, backpointer-length,
    * predecessor-rank) triples — the standard k-best Viterbi. Total
    * order everywhere: candidates rank by (cost asc, piece-length
    * desc, predecessor-rank asc), so the list replays verbatim in SQL
    * as a rank ≤ n window per position. Paths through unreachable
    * rank slots carry the Inf sentinel and are dropped at the end, so
    * a word with fewer than n distinct segmentations emits fewer
    * rows. Returns one row per (word, rank ≤ n): `rank`, `pieces`,
    * `n_pieces`, `cost` (exact path cost in ppm).
    *
    * Same shape/caller contract as [[viterbiSegment]]: one per-row
    * fold over the word vocabulary, zero shuffles, vocabulary-bounded
    * — n multiplies the constant-size cell, never the corpus work.
    */
  def nbestSegment(words: DataFrame, wordCol: String,
      costs: Seq[(String, Long)], maxPieceLen: Int, maxWordLen: Int,
      n: Int): DataFrame = {
    require(costs.nonEmpty && maxPieceLen >= 1 && maxWordLen >= 1 && n >= 1)
    val costMap = typedLit(costs.toMap)
    val w = col(wordCol)
    val len = length(w)
    val init = array((0 to maxWordLen).map { p =>
      array((1 to n).map { r =>
        struct(lit(if (p == 0 && r == 1) 0L else Inf).as("c"),
          lit(0).as("bl"), lit(0).as("pr"))
      }: _*)
    }: _*)
    val dp = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      init,
      (st, pos) => {
        // all (piece length, predecessor rank) arrivals at `pos`;
        // the sort key (c, maxPieceLen-l, pr) is total over real
        // candidates and keeps the longer-piece-on-tie rule
        val cands = for {
          l <- maxPieceLen to 1 by -1
          r <- 1 to n
        } yield {
          val prev = element_at(
            element_at(st, greatest(lit(1), pos - lit(l) + 1)), r)
          val piece = w.substr(pos - lit(l) + 1, lit(l))
          val pc = coalesce(element_at(costMap, piece), lit(Inf))
          val cc = when(lit(l) <= pos, prev.getField("c") + pc)
            .otherwise(lit(Inf * 4))
          struct(cc.as("c"), lit(maxPieceLen - l).as("lneg"),
            lit(r).as("pr"), lit(l).as("bl"))
        }
        val top = transform(
          slice(array_sort(array(cands: _*)), 1, n),
          t => struct(t.getField("c").as("c"), t.getField("bl").as("bl"),
            t.getField("pr").as("pr")))
        when(pos > len, st)
          .otherwise(transform(st, (cell, i) =>
            when(i === pos, top).otherwise(cell)))
      })
    // per-rank backtrace: walk (pos, rank) via (bl, pr); rank 0 marks
    // an Inf dummy chain — freeze (the row is dropped by the final
    // cost filter; under ANSI the guard also keeps element_at off
    // index 0)
    def bt(j: Int): Column = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      struct(len.as("pos"), lit(j).as("rk"),
        array().cast("array<string>").as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val rk = acc.getField("rk")
        when(pos <= 0 || rk <= 0, acc).otherwise {
          val cell = element_at(element_at(dp, pos + 1), rk)
          struct((pos - cell.getField("bl")).as("pos"),
            cell.getField("pr").as("rk"),
            concat(array(w.substr(pos - cell.getField("bl") + 1,
              cell.getField("bl"))), acc.getField("ps")).as("ps"))
        }
      }).getField("ps")
    val ranks = array((1 to n).map { j =>
      struct(lit(j.toLong).as("rank"), bt(j).as("pieces"),
        element_at(element_at(dp, len + 1), j).getField("c").as("cost"))
    }: _*)
    words
      .withColumn("__r", explode(ranks))
      .withColumn("rank", col("__r.rank"))
      .withColumn("pieces", col("__r.pieces"))
      .withColumn("cost", col("__r.cost"))
      .filter(col("cost") < Inf)
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .drop("__r")
  }

  private def viterbiCore(words: DataFrame, wordCol: String,
      costs: Seq[(String, Long)], maxPieceLen: Int,
      maxWordLen: Int, jitter: Option[(String, Long)]): DataFrame = {
    require(costs.nonEmpty && maxPieceLen >= 1 && maxWordLen >= 1)
    val costMap = typedLit(costs.toMap)
    val w = col(wordCol)
    val len = length(w)
    val init = array((0 to maxWordLen).map { i =>
      struct(lit(if (i == 0) 0L else Inf).as("c"), lit(0).as("bl"))
    }: _*)
    val dp = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      init,
      (st, pos) => {
        // best arrival at `pos`: probe lengths maxPieceLen..1 so a
        // tie keeps the longest piece (strict < never replaces equal)
        val zero = struct(lit(Inf * 4).as("c"), lit(0).as("bl"))
        val best = (maxPieceLen to 1 by -1).foldLeft(zero: Column) {
          (acc, l) =>
            val prev = element_at(st,
              greatest(lit(1), pos - lit(l) + 1)).getField("c")
            val piece = w.substr(pos - lit(l) + 1, lit(l))
            val pc = jitter match {
              case None => coalesce(element_at(costMap, piece), lit(Inf))
              case Some((salt, j)) =>
                // per-OCCURRENCE perturbation: a null map lookup stays
                // null through the add, so unknown pieces still fall
                // to Inf via the coalesce
                val h = conv(substring(md5(concat(w, lit(":"),
                  pos.cast("string"), lit(":"), piece, lit(":"),
                  lit(salt))), 1, 15), 16, 10).cast("long")
                coalesce(element_at(costMap, piece) + h % j, lit(Inf))
            }
            val cc = prev + pc
            when(lit(l) <= pos && cc < acc.getField("c"),
              struct(cc.as("c"), lit(l).as("bl"))).otherwise(acc)
        }
        when(pos > len, st)
          .otherwise(transform(st, (cell, i) =>
            when(i === pos, best).otherwise(cell)))
      })
    // backtrace: walk bl pointers from len to 0, prepending pieces so
    // the array reads left to right; at most maxWordLen hops
    val bt = aggregate(
      sequence(lit(1), lit(maxWordLen)),
      struct(len.as("pos"),
        array().cast("array<string>").as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val bl = element_at(dp, greatest(lit(1), pos + 1)).getField("bl")
        when(pos <= 0, acc).otherwise(
          struct((pos - bl).as("pos"),
            concat(array(w.substr(pos - bl + 1, bl)),
              acc.getField("ps")).as("ps")))
      })
    words
      .withColumn("pieces", bt.getField("ps"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .withColumn("cost",
        element_at(dp, len + 1).getField("c"))
  }

  /** Full trainer: seed → prune → score, then `rounds` hard-EM
    * rounds. Returns the final scored piece table (piece, w, cost)
    * and the vocabulary segmented under the final costs.
    *
    * Per round exactly ONE Spark action runs (the vocabulary-bounded
    * chosen-path piece recount); pruning and the lnPpm scores are
    * computed on the collected piece table in Scala
    * ([[FixedPoint.lnPpmLong]], bit-identical to the column kernel —
    * UnigramLmSpec pins it). The piece table is ≤ singles+topM rows
    * BY CONSTRUCTION, so the driver work is constant-size; the
    * distributed surfaces stay the E-step fold and the corpus-scale
    * encode. (The earlier form ran an agg readout + a full-table
    * collect per round through a DataFrame scorer — ~7 actions/train
    * — which measurably dominated the tokenizer gates late in a
    * long-lived benchmark JVM.)
    */
  def train(words: DataFrame, wordCol: String, cntCol: String,
      rounds: Int, maxPieceLen: Int, maxWordLen: Int,
      topM: Int): (DataFrame, DataFrame) = {
    require(rounds >= 0)
    // enforce the documented contract here rather than relying on the
    // caller: over-long words would index the Viterbi arrays past
    // maxWordLen and silently vanish from the M-step recount
    val words0 = words.filter(
      length(col(wordCol)).between(1, maxWordLen))
    def pruneSeq(pw: Seq[(String, Long)]): Seq[(String, Long)] = {
      val (singles, multis) = pw.partition(_._1.length == 1)
      singles ++ multis.sortBy { case (p, w) => (-w, p) }.take(topM)
    }
    def toScored(pw: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
      val total = pw.map(_._2).sum
      pw.map { case (p, w) =>
        (p, w, graft.functions.FixedPoint.lnPpmLong(total, w))
      }
    }
    // Prune DISTRIBUTED before collecting: the raw seed pool is one
    // row per distinct substring of the word vocabulary (10^8+ at
    // corpus scale); [[prunePieces]] cuts it to ≤ singles+topM rows
    // on the cluster under the same (w desc, piece asc) total order
    // as pruneSeq, so only the bounded table ever reaches the driver.
    var scored = toScored(
      prunePieces(seedPieces(words0, wordCol, cntCol, maxPieceLen), topM)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy { case (p, w) => (-w, p) })
    for (_ <- 1 to rounds) {
      val costs = scored.map(t => (t._1, t._3))
      val used = viterbiSegment(words0, wordCol, costs, maxPieceLen,
          maxWordLen)
        .select(col(cntCol).as("__c"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("__c")).as("__used"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // +1 smoothing over the CURRENT piece set, then prune + rescore
      scored = toScored(pruneSeq(
        scored.map { case (p, _, _) => (p, used.getOrElse(p, 0L) + 1L) }))
    }
    val segmented = viterbiSegment(words0, wordCol,
      scored.map(t => (t._1, t._3)), maxPieceLen, maxWordLen)
    val spark = words.sparkSession
    import scala.jdk.CollectionConverters._
    val scoredDf = spark.createDataFrame(
      scored.sortBy(_._1)
        .map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cost",
          org.apache.spark.sql.types.LongType))))
    (scoredDf, segmented)
  }
}
