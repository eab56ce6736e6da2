package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the second multi-dimensional
  * layout key beside [[graft.operators.Partitioning.zValue2]] (Morton).
  * Where Z-order's bit interleave has long diagonal jumps at power-of-
  * two boundaries (the scan-range fragmentation Delta/Iceberg moved to
  * Hilbert clustering to avoid), the Hilbert curve visits every cell of
  * the 2^bits × 2^bits grid in a path whose consecutive cells are
  * always GRID-ADJACENT — so any value range maps to one compact blob
  * of cells and parquet min/max stats stay tight on both dimensions
  * with strictly less fragmentation.
  *
  * The classic xy→d walk (one rotate/flip per bit level, Hamilton's
  * formulation as popularized in the Wikipedia C routine) is a
  * state-carrying loop — expressed as Column arithmetic it would
  * duplicate subtrees exponentially per level, so it runs here as a
  * codegen kernel: `bits` iterations of primitive long arithmetic,
  * inside whole-stage codegen (the same reasoning as every byte-walk
  * kernel in this package).
  *
  * Inputs are masked to `bits` bits (quantize wider domains first,
  * exactly as zValue2 callers do). Output d ∈ [0, 4^bits).
  */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"HilbertValue needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")
    else if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(s"bits must be in [1, 31], got $bits")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertValue.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y, s, rx, ry, t) =
        (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("s"),
          ctx.freshName("rx"), ctx.freshName("ry"), ctx.freshName("t"))
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |${ev.value} = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  ${ev.value} += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = ${mask}L - $x;
         |      $y = ${mask}L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object HilbertValue {

  /** Plain-JVM walk shared by eval and the spec reference checks. */
  def xy2d(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = a & mask
    var y = b & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = mask - x; y = mask - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column API: Hilbert index of two `bits`-bit quantized bigints. */
  def hilbert_value(a: Column, b: Column, bits: Int = 16): Column =
    GraftBridge.column(HilbertValue(
      GraftBridge.expression(a), GraftBridge.expression(b), bits))
}
