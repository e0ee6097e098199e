package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Signature builder shared by interpreted and generated code.
  *
  * One-permutation hashing (Li, Owen & Zhang, NIPS'12): instead of k
  * independent permutation-minimums — k multiply-mod passes over the
  * shingle-hash array — ONE pass bins each hash by `h mod k` and
  * takes the per-bin minimum; empty bins borrow the signature of the
  * nearest non-empty bin scanning RIGHT circularly (the rotation
  * densification of Shrivastava & Li, ICML'14 — the variant without
  * the bias-breaking offset, which would need a second hash; the
  * borrow direction is part of the spec and the DuckDB oracle
  * replays it as a coalesce chain). An input with no hashes at all
  * yields k nulls.
  */
object OnePermUtil {
  def signature(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    val has = new Array[Boolean](k)
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      // null elements are SKIPPED — exactly what the portable
      // filter/array_min composition does (null % k is null, so the
      // filter drops it); transform-built producer arrays carry
      // containsNull=true even when no element is ever null
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        // floorMod keeps the bin in [0, k) even for an
        // out-of-contract negative hash (identical to % for the
        // non-negative 60-bit contract case)
        val j = java.lang.Math.floorMod(h, k.toLong).toInt
        if (!has(j) || h < mins(j)) { mins(j) = h; has(j) = true }
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    i = 0
    while (i < k) {
      if (has(i)) out(i) = java.lang.Long.valueOf(mins(i))
      else {
        var d = 1
        while (d < k && out(i) == null) {
          val j = (i + d) % k
          if (has(j)) out(i) = java.lang.Long.valueOf(mins(j))
          d += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native one-pass OPH signature over a non-negative long hash array.
  * The k-permutation formulation costs k multiply-mod traversals of
  * the hash array per row; this is ONE traversal + a k-sized
  * densification sweep — the difference between O(k·shingles) and
  * O(shingles + k) per document, which at 100 TB is the signature
  * stage's whole budget. Bit-equality with the portable
  * filter/array_min composition is asserted in OnePermMinHashSpec.
  */
case class OnePermMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure("k must be >= 1")
    case t =>
      TypeCheckResult.TypeCheckFailure(s"oph requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_oph"

  override protected def nullSafeEval(input: Any): Any =
    OnePermUtil.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.OnePermUtil.signature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): OnePermMinHash =
    copy(child = newChild)
}

object OnePermMinHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def onePermNative(c: Column, k: Int): Column =
    Bridge.column(OnePermMinHash(Bridge.expression(c), k))
}
