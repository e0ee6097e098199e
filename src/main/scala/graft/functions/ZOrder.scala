package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional clustering
  * key behind data-skipping layouts: sorting/range-partitioning a
  * 100 TB table by `zKey(dimA, dimB)` keeps rows close in BOTH
  * dimensions close in the file order, so min/max footer stats prune
  * scans for predicates on either dimension (the technique Delta/
  * Iceberg expose as OPTIMIZE ZORDER; here it is a plain column
  * expression usable with `sortWithinPartitions`/`repartitionByRange`).
  *
  * Pure integer bit arithmetic (shifts, masks, adds) — codegen'd,
  * deterministic, and reproducible in any engine with `>>`/`<<`/`&`.
  * Inputs must be nonnegative and fit in `bits` bits; bits ≤ 31 keeps
  * the interleaved key inside a positive long.
  */
object ZOrder {

  def zKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31)
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** [[zKey]] over RANGE-NORMALIZED axes: each input is first mapped
    * to its `bits`-bit range id, `(v - lo) · 2^bits / (hi - lo + 1)`,
    * so both axes occupy the full 0..2^bits−1 domain before
    * interleaving. Raw interleaving of axes with unequal or offset
    * ranges wastes most of the z-domain and makes equal-width z
    * buckets wildly unequal in MASS (measured on the q453 fixture:
    * the "clustered" layout scanned MORE rows than the linear one);
    * per-column range ids are exactly what production OPTIMIZE
    * ZORDER implementations interleave. Everything stays integer —
    * one subtract, one shift, one integral divide per axis — so the
    * key is engine-replayable. Caller supplies the bounds (one agg
    * readout); lo ≤ v ≤ hi is the contract.
    */
  def zKeyNormalized(x: Column, xLo: Long, xHi: Long,
      y: Column, yLo: Long, yHi: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 20, "bits ≤ 20 keeps (range << bits) in i64")
    val s = 1L << bits
    val xn = graft.functions.FixedPoint.idiv(
      (x.cast("long") - xLo) * s, lit(xHi - xLo + 1))
    val yn = graft.functions.FixedPoint.idiv(
      (y.cast("long") - yLo) * s, lit(yHi - yLo + 1))
    zKey(xn, yn, bits)
  }

  /** 2-D HILBERT curve index of `(x, y)` on the `2^bits × 2^bits`
    * grid — the strictly-better clustering key for rectangle
    * predicates: consecutive Hilbert indices are always GRID
    * NEIGHBORS (no z-domain jumps), so equal-width key buckets are
    * spatially compact and a two-axis rectangle overlaps fewer of
    * them than under Morton order. The classic per-bit fold (test
    * the bit of each axis, accumulate the quadrant's offset,
    * reflect+swap the frame for the next level); `n−1−v` is the
    * `bits`-wide bitwise complement, so every step is integer
    * and/xor/subtract — replayable verbatim in any engine
    * ([[hilbertSqlExpr]] is the DuckDB mirror). Runs as a
    * higher-order fold over the bit positions: constant-size
    * expression tree, zero shuffles.
    *
    * Inputs must lie in `[0, 2^bits)`; compose with the same range
    * normalization as [[zKeyNormalized]] for raw axes.
    */
  def hilbertKey(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 20, "bits ≤ 20 keeps s·s·3 in i64")
    val n1 = (1L << bits) - 1L
    val svals = array(((bits - 1) to 0 by -1).map(i => lit(1L << i)): _*)
    aggregate(
      svals,
      struct(x.cast("long").as("x"), y.cast("long").as("y"),
        lit(0L).as("d")),
      (st, s) => {
        val cx = st.getField("x")
        val cy = st.getField("y")
        val rx = when(cx.bitwiseAND(s) =!= 0L, 1L).otherwise(0L)
        val ry = when(cy.bitwiseAND(s) =!= 0L, 1L).otherwise(0L)
        val nd = st.getField("d") +
          s * s * (lit(3L) * rx).bitwiseXOR(ry)
        // ry=0: maybe-reflect (rx=1) then swap axes; ry=1: keep
        val nx = when(ry === 0L,
          when(rx === 1L, lit(n1) - cy).otherwise(cy)).otherwise(cx)
        val ny = when(ry === 0L,
          when(rx === 1L, lit(n1) - cx).otherwise(cx)).otherwise(cy)
        struct(nx.as("x"), ny.as("y"), nd.as("d"))
      }).getField("d")
  }

  /** [[hilbertKey]] over the same range-normalized axes as
    * [[zKeyNormalized]] — drop-in alternative cluster key for
    * [[graft.sources.TxLog.commitClustered]].
    */
  def hilbertKeyNormalized(x: Column, xLo: Long, xHi: Long,
      y: Column, yLo: Long, yHi: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 20)
    val s = 1L << bits
    val xn = graft.functions.FixedPoint.idiv(
      (x.cast("long") - xLo) * s, lit(xHi - xLo + 1))
    val yn = graft.functions.FixedPoint.idiv(
      (y.cast("long") - yLo) * s, lit(yHi - yLo + 1))
    hilbertKey(xn, yn, bits)
  }

  /** DuckDB mirror of [[hilbertKey]] as UNROLLED per-bit CTE stages
    * (`${pfx}0` … `${pfx}$bits`, carrying `carryCols` plus the fold
    * state `hx, hy, hd`). NOT a `list_reduce`: DuckDB 1.0.0's
    * `list_reduce` with a STRUCT accumulator silently corrupts the
    * state above tiny batch sizes (measured: correct at 4 rows,
    * wrong at 8 — a lambda state-vector slicing bug), so the replay
    * unrolls the same arithmetic where every stage is a plain
    * projection. `srcCte` must expose `carryCols`, `$xCol`, `$yCol`.
    * Read `hd` from `${pfx}$bits`.
    */
  def hilbertSqlCtes(pfx: String, srcCte: String, xCol: String,
      yCol: String, carryCols: Seq[String], bits: Int): String = {
    require(bits > 0 && bits <= 20)
    val n1 = (1L << bits) - 1L
    val carry = carryCols.mkString(", ")
    val stages = (1 to bits).map { i =>
      val s = 1L << (bits - i)
      s"""$pfx$i AS (SELECT $carry,
         |  CASE WHEN (hy & $s) = 0 THEN
         |    (CASE WHEN (hx & $s) <> 0 THEN $n1 - hy ELSE hy END)
         |  ELSE hx END AS hx,
         |  CASE WHEN (hy & $s) = 0 THEN
         |    (CASE WHEN (hx & $s) <> 0 THEN $n1 - hx ELSE hx END)
         |  ELSE hy END AS hy,
         |  hd + ${s * s} * xor(
         |    3 * (CASE WHEN (hx & $s) <> 0 THEN 1 ELSE 0 END),
         |    (CASE WHEN (hy & $s) <> 0 THEN 1 ELSE 0 END)) AS hd
         |FROM $pfx${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""${pfx}0 AS (SELECT $carry, CAST($xCol AS BIGINT) AS hx,
       |    CAST($yCol AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd
       |  FROM $srcCte),
       |$stages""".stripMargin
  }
}
