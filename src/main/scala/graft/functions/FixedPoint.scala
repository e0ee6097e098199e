package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic fixed-point transcendentals over integer columns —
  * the machinery that lets score formulas with a logarithm hash-gate
  * cross-engine (the q405 nDCG discipline, generalized): every step is
  * an i64 add/multiply/shift/compare, identical in Spark (`div`,
  * `shiftright`) and DuckDB (`//`), so both engines produce the SAME
  * integer, not two floats that agree to a few ulps.
  *
  * The kernel is the classic shift-and-square binary logarithm
  * (Majithia & Levan 1973 — each squaring exposes one fractional bit
  * of log2): normalize m to [2^30, 2^31) counting the exponent, then
  * 20 rounds of m ← m²/2^30 emit 20 fractional bits. All state fits
  * i64 (m² < 2^62); the folds are runtime higher-order `aggregate`
  * calls over constant-length sequences — constant-size expression
  * trees, whole-stage-codegen friendly, zero shuffles.
  *
  * Precision: truncation at each squaring loses < 2^-19 of log2(x) —
  * a relative idf error ~1e-6..1e-5, far below any ranking-relevant
  * gap; and since both engines truncate IDENTICALLY, exactness of the
  * COMPARISON is unconditional.
  */
object FixedPoint {

  private val Scale = 1L << 30 // m's fixed-point scale
  private val FracBits = 20 // log2 fractional bits extracted
  private val Ln2Fx = 693147L // floor(1e6·ln 2): ppm per log2 unit

  /** Column-level `a div b` (truncating integer division — the
    * SQL `div` operator, DuckDB `//`). The functions API only offers
    * float `/`, so this goes through the catalyst bridge.
    */
  def idiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        Bridge.expression(a), Bridge.expression(b)))
  }

  /** floor-truncated `2^20 · log2(num/den)` for positive integral
    * columns with `num >= den` (ratio ≥ 1, so the exponent pass only
    * ever shifts DOWN; 34 downshifts cover num/den < 2^34·2 with the
    * initial 2^30 scale). Contract: `num < 2^33` so `num·2^30` fits
    * i64 — for idf arguments that is n_docs < 2^32, the float
    * [[graft.operators.Search.bm25]] stays the beyond-that API.
    */
  def log2Fx(num: Column, den: Column): Column = {
    val m0 = idiv(num * Scale, den)
    // exponent pass: downshift m into [2^30, 2^31), counting shifts
    val norm = aggregate(
      sequence(lit(1), lit(34)),
      struct(m0.as("m"), lit(0L).as("e")),
      (st, _) => {
        val m = st.getField("m")
        when(m >= Scale * 2,
          struct(shiftright(m, 1).as("m"),
            (st.getField("e") + 1L).as("e")))
          .otherwise(st)
      })
    // fraction pass: 20 shift-and-square rounds, one bit each
    val fracSt = aggregate(
      sequence(lit(1), lit(FracBits)),
      struct(norm.getField("m").as("m"), lit(0L).as("f")),
      (st, _) => {
        val sq = shiftright(st.getField("m") * st.getField("m"), 30)
        when(sq >= Scale * 2,
          struct(shiftright(sq, 1).as("m"),
            (st.getField("f") * 2L + 1L).as("f")))
          .otherwise(struct(sq.as("m"),
            (st.getField("f") * 2L).as("f")))
      })
    norm.getField("e") * (1L << FracBits) + fracSt.getField("f")
  }

  /** Truncated `1e6 · ln(num/den)` (parts-per-million) under the
    * [[log2Fx]] contract. Routed through the native codegen
    * [[graft.expressions.LnPpmFx]] kernel: the portable fold below
    * runs through higher-order `aggregate` (CodegenFallback in
    * Spark), which would break every caller's whole-stage-codegen
    * span; the native form is the same 54 i64 steps as two tight
    * loops inside generated code. Bit-identity of the three
    * formulations (native, portable fold, DuckDB recursive CTE) is
    * asserted in LnPpmFxSpec / the q424-q430 oracle gates.
    */
  def lnPpm(num: Column, den: Column): Column =
    graft.expressions.LnPpmFx.lnPpmNative(
      num.cast("long"), den.cast("long"))

  /** Driver-side Scala form of [[lnPpm]] — the IDENTICAL 54 i64 steps
    * (same contract: den ≤ num < 2^33), for iterative trainers whose
    * per-round score tables are driver-resident anyway (the unigram-LM
    * piece table): scoring k bounded rows in Scala costs zero Spark
    * actions, where a per-round agg+collect pair measurably dominated
    * the trainer late in a long-lived JVM. Bit-identity with the
    * column kernel is asserted in UnigramLmSpec.
    */
  def lnPpmLong(num: Long, den: Long): Long = {
    require(den > 0 && num >= den && num < (1L << 33),
      s"lnPpmLong contract violated: num=$num den=$den")
    var m = (num * Scale) / den
    var e = 0L
    var i = 0
    while (i < 34) {
      if (m >= Scale * 2) { m >>= 1; e += 1 }
      i += 1
    }
    var f = 0L
    i = 0
    while (i < FracBits) {
      val sq = (m * m) >> 30
      if (sq >= Scale * 2) { m = sq >> 1; f = f * 2 + 1 }
      else { m = sq; f = f * 2 }
      i += 1
    }
    ((e * (1L << FracBits) + f) * Ln2Fx) / (1L << FracBits)
  }

  /** The portable Column-composition form of [[lnPpm]] — kept as the
    * reference formulation the native kernel must match bit-for-bit
    * (and for environments that refuse custom expressions).
    */
  def lnPpmPortable(num: Column, den: Column): Column =
    idiv(log2Fx(num, den) * Ln2Fx, lit(1L << FracBits))

  /** The DuckDB mirror of [[log2Fx]]+[[lnPpm]] as a recursive-CTE SQL
    * fragment, so every gate using lnPpm replays the IDENTICAL i64
    * algorithm: given a CTE `src` with columns (key, num, den),
    * produces CTEs ending in `lnppm(key, ln_ppm)`. Inline with
    * `s"WITH …, ${FixedPoint.lnPpmSqlCtes("src")}, …"`.
    */
  def lnPpmSqlCtes(src: String): String = lnPpmSqlCtes(src, "")

  /** [[lnPpmSqlCtes]] with a CTE-name prefix, so one oracle can
    * replay the kernel at several pipeline stages (each stage's input
    * depending on the previous stage's output — e.g. EM rounds of the
    * unigram-LM trainer) without CTE name collisions: produces
    * `${p}fx0 … ${p}lnppm(key, ln_ppm)`.
    */
  def lnPpmSqlCtes(src: String, p: String): String =
    s"""${p}fx0 AS (SELECT key, (num * 1073741824) // den AS m,
       |    CAST(0 AS BIGINT) AS e, 0 AS i FROM $src),
       |${p}fxn AS (
       |  SELECT key, m, e, i FROM ${p}fx0
       |  UNION ALL
       |  SELECT key,
       |    CASE WHEN m >= 2147483648 THEN m // 2 ELSE m END,
       |    CASE WHEN m >= 2147483648 THEN e + 1 ELSE e END, i + 1
       |  FROM ${p}fxn WHERE i < 34),
       |${p}fxf0 AS (SELECT key, m, e, CAST(0 AS BIGINT) AS f, 0 AS j
       |  FROM ${p}fxn WHERE i = 34),
       |${p}fxf AS (
       |  SELECT key, m, e, f, j FROM ${p}fxf0
       |  UNION ALL
       |  SELECT key,
       |    CASE WHEN (m * m) // 1073741824 >= 2147483648
       |      THEN ((m * m) // 1073741824) // 2
       |      ELSE (m * m) // 1073741824 END,
       |    e,
       |    CASE WHEN (m * m) // 1073741824 >= 2147483648
       |      THEN f * 2 + 1 ELSE f * 2 END,
       |    j + 1
       |  FROM ${p}fxf WHERE j < 20),
       |${p}lnppm AS (SELECT key,
       |    ((e * 1048576 + f) * 693147) // 1048576 AS ln_ppm
       |  FROM ${p}fxf WHERE j = 20)""".stripMargin
}
