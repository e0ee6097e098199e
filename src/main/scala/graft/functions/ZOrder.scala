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
}
