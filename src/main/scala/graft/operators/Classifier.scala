package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: a distributed logistic-regression
  * scorer trained by full-batch gradient descent — the "train a small
  * classifier on quality features, score the corpus" stage of LLM
  * data pipelines (the reference has no trained models; this is the
  * extension surface's model-based filter, the CCNet/LLaMA-style
  * quality-classifier pattern re-expressed Spark-first).
  *
  * 100 TB shape: each GD round is ONE corpus pass — features and the
  * per-row gradient contribution ride the scan, and a single global
  * aggregate of d+1 quantized long sums reaches the driver (d =
  * feature count, never data-sized). No instance matrix is
  * materialized, nothing shuffles (a 1-row partial agg), and scoring
  * is a pure projection with the trained weights as literals. This is
  * the classic distributed-LR formulation (full-batch gradient as a
  * partial aggregate); rounds are O(10), so the driver traffic is
  * trivial.
  *
  * Determinism (what makes a TRAINER oracle-gateable): the sigmoid is
  * the rational fast-sigmoid σ̂(z) = 0.5 + z/(2(1+|z|)) — add, mul,
  * div, abs are single correctly-rounded IEEE ops, unlike exp whose
  * libm rounding differs across engines. Gradient sums quantize to
  * longs (floor(g·2^20), the [[Similarity.KmQ]] discipline) so the
  * partial-agg order can't perturb the result, and every weight
  * update is the same fixed sequence of double ops on both engines.
  */
object Classifier {

  /** Quantization scale for gradient accumulation (see scaladoc). */
  val GradQ: Double = 1048576.0

  /** Engine-exact rational sigmoid: 0.5 + z/(2(1+|z|)) ∈ (0,1),
    * monotone, σ̂(0) = 0.5 — the fast-sigmoid surrogate. Exact IEEE
    * ops only; mirror verbatim in SQL.
    */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** w·x in fixed left-to-right association — (x0·w0) + (x1·w1) + …
    * — so the double is engine-identical.
    */
  def margin(features: Seq[Column], w: Seq[Double]): Column = {
    require(features.size == w.size, "margin: |features| must equal |w|")
    features.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
  }

  /** `rounds` full-batch GD rounds from `init`: per round, gradient_j
    * = Σ_rows (σ̂(w·x) − y)·x_j accumulated as quantized longs, then
    * w_j ← w_j − η·g_j/(n·2^20) on the driver. Null features/labels
    * contribute nothing to the sums (both engines' SUM skips NULL)
    * while still counting in n.
    */
  def lrTrain(df: DataFrame, features: Seq[Column], label: Column,
      init: Seq[Double], eta: Double, rounds: Int): Seq[Double] = {
    require(rounds >= 0 && features.nonEmpty)
    var w = init
    for (_ <- 1 to rounds) {
      val err = fastSigmoid(margin(features, w)) - label
      val aggs = count(lit(1)).as("n") +: features.zipWithIndex.map {
        case (f, j) => sum(floor(err * f * GradQ)).as(s"g$j")
      }
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = r.getLong(0).toDouble
      w = w.zipWithIndex.map { case (wi, j) =>
        wi - eta * (r.getLong(j + 1).toDouble / (n * GradQ))
      }
    }
    w
  }

  /** Scored corpus: score_ppm = ⌊σ̂(w·x)·10⁶⌋ (long — the hashable
    * fixed-point form) and pred = score ≥ 0.5 as 1/0. Pure projection;
    * the trained weights are plan literals.
    */
  def lrScore(features: Seq[Column], w: Seq[Double]): (Column, Column) = {
    val p = fastSigmoid(margin(features, w))
    val scorePpm = floor(p * lit(1000000.0))
    (scorePpm, when(scorePpm >= 500000L, lit(1L)).otherwise(lit(0L)))
  }

  /** Weak-supervision label aggregation (the Snorkel majority-vote
    * baseline): each labeling function emits a nullable STRING label
    * (null = abstain); the aggregate label is the strict-majority
    * winner among non-abstaining LFs, null on ties or all-abstain —
    * ties are genuinely ambiguous and a deterministic "first wins"
    * would bake LF order into the labels. Pure array expressions
    * over the LF outputs (votes is ≤ #LFs long), so labeling rides
    * the scan at 100 TB: no shuffle, no UDF, fully codegen'd.
    * Emits `n_votes` (non-abstain count) and `label`.
    */
  def majorityVote(lfs: Seq[Column]): (Column, Column) = {
    require(lfs.nonEmpty)
    val votes = filter(array(lfs: _*), v => v.isNotNull)
    val counts = transform(array_distinct(votes),
      c => struct(size(filter(votes, v => v === c)).as("n"), c.as("lab")))
    val best = array_max(counts)
    val nBest = size(filter(counts, s => s("n") === best("n")))
    val label = when(size(votes) > 0 && nBest === 1, best("lab"))
    (size(votes).cast("long"), label)
  }

  /** Split-conformal prediction intervals, Mondrian (per-category)
    * form — the distribution-free uncertainty wrapper for ANY point
    * predictor: fit on train, take the ceil(level·n)-th largest
    * absolute residual on a held-out CALIBRATION fold as the radius,
    * and the interval ŷ ± radius covers ≥ level of future points
    * under exchangeability. Here the predictor is the per-category
    * train mean (milli grain, matching [[Aggregates.targetEncodeLoo]]
    * scale) and the EVAL fold audits the coverage claim — the
    * end-to-end loop a scoring pipeline runs before trusting its
    * error bars. All integer: means by milli div, radius by
    * nearest-rank selection, coverage in ppm.
    *
    * `df` must carry an integral label and a fold column (from
    * [[Corpus.groupKFold]] so group leakage cannot inflate coverage).
    * One category-keyed agg over train, one bounded-group window
    * (rank selection within category × calib — category count ×
    * calib rows, never corpus-wide), one broadcast-sized join back.
    */
  def conformalCoverage(df: DataFrame, catCol: String, labelCol: String,
      foldCol: String, calibFold: Long, evalFold: Long,
      levelPct: Int): DataFrame = {
    require(levelPct >= 1 && levelPct <= 99)
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(catCol).as("cat"),
      col(labelCol).cast("long").as("y"), col(foldCol).as("fold"))
    val train = base.filter(col("fold") =!= calibFold &&
        col("fold") =!= evalFold)
      .groupBy(col("cat"))
      .agg(count(lit(1)).as("n_train"),
        expr("sum(y) * 1000L div count(1)").as("yhat_milli"))
    val wRank = Window.partitionBy(col("cat"))
      .orderBy(col("err_milli"), col("y"))
    val calib = base.filter(col("fold") === calibFold)
      .join(train, Seq("cat"))
      .withColumn("err_milli", abs(col("y") * 1000L - col("yhat_milli")))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .withColumn("n_calib",
        count(lit(1)).over(Window.partitionBy(col("cat"))))
      .filter(col("rnk") ===
        expr(s"($levelPct * n_calib + 99) div 100"))
      .select(col("cat"), col("n_calib"),
        col("err_milli").as("radius_milli"))
    base.filter(col("fold") === evalFold)
      .join(train, Seq("cat")).join(calib, Seq("cat"))
      .groupBy(col("cat"), col("n_train"), col("yhat_milli"),
        col("n_calib"), col("radius_milli"))
      .agg(count(lit(1)).as("n_eval"),
        count(when(abs(col("y") * 1000L - col("yhat_milli"))
          <= col("radius_milli"), 1)).as("n_covered"))
      .withColumn("coverage_ppm",
        expr("n_covered * 1000000L div n_eval"))
  }
}
