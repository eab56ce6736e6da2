package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** IVF cell routing with a DRIVER-SIDE centroid table: the `probes`
  * nearest cells of a quantized vector, by exact integer squared L2
  * with ties to the smaller cell id — the identical total order the
  * batch packed-argmin router produces.
  *
  * Exists for the STREAMING side of ANN: window functions (the batch
  * probe ranking) are unsupported on streams, but a per-row expression
  * is stateless and stream-safe — the trained coarse quantizer is tiny
  * (nCells × dims longs), so it ships inside the operator exactly like
  * [[PqCodec]]'s codebook, and the probed cells explode into a
  * stream-static equi-join against the static cell-partitioned index.
  *
  * Layout: `cells(c)`/`cents(c)`/`cn2(c)` are the cell id, quantized
  * centroid, and its self-dot.
  */
object IvfRoute {
  def ivf_probe_cells(q: Column, cells: Array[Long],
      cents: Array[Array[Long]], cn2: Array[Long], probes: Int): Column =
    GraftBridge.column(IvfProbeCells(
      GraftBridge.expression(q), cells, cents, cn2, probes))
}

case class IvfProbeCells(child: Expression, cells: Array[Long],
    cents: Array[Array[Long]], cn2: Array[Long], probes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(LongType, false) || t == ArrayType(LongType, true)
    if (!ok(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"needs array<bigint> input, got ${child.dataType}")
    else if (cents.length != cells.length || cn2.length != cells.length)
      TypeCheckResult.TypeCheckFailure("centroid arrays must align")
    else if (probes < 1 || probes > cells.length)
      TypeCheckResult.TypeCheckFailure(
        s"probes must be in [1, ${cells.length}], got $probes")
    // the batch router's packed-long contract (Clustering.assign):
    // cell ids must fit the 20 low bits and ‖c‖² must leave dist² in
    // the 43 high bits — caller-supplied arrays outside those bounds
    // would silently overflow the packing and corrupt probe order.
    // Bounds are STRICT (< 2⁴¹): norms of exactly 2⁴¹ admit an
    // antipodal dist² of exactly 2⁴³, whose ·2²⁰ packing hits 2⁶³
    // and flips the sign — the precise corruption being guarded.
    else if (cells.exists(c => c < 0L || c >= (1L << 20)))
      TypeCheckResult.TypeCheckFailure(
        "cell id overflows the 20 packed bits")
    else if (cn2.exists(n2 => n2 < 0L || n2 >= (1L << 41)))
      TypeCheckResult.TypeCheckFailure(
        "centroid squared norm too large for the packed-long ordering")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** dist²·2²⁰ + cell packed ordering, selection of the `probes`
    * smallest — the batch router's exact total order.
    */
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dims = cents(0).length
    if (a.numElements() != dims) return null
    val n = cells.length
    val packed = new Array[Long](n)
    var qn2 = 0L
    var i = 0
    while (i < dims) { val v = a.getLong(i); qn2 += v * v; i += 1 }
    if (qn2 >= (1L << 41)) throw new IllegalArgumentException(
      s"IvfProbeCells: query squared norm $qn2 overflows the packed-long ordering (max ${(1L << 41) - 1})")
    var c = 0
    while (c < n) {
      val cv = cents(c)
      var dot = 0L
      var j = 0
      while (j < dims) { dot += a.getLong(j) * cv(j); j += 1 }
      packed(c) = (qn2 + cn2(c) - 2L * dot) * (1L << 20) + cells(c)
      c += 1
    }
    java.util.Arrays.sort(packed)
    val out = new Array[Long](probes)
    var p = 0
    while (p < probes) { out(p) = packed(p) % (1L << 20); p += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cellsRef = ctx.addReferenceObj("ivfCells", cells, "long[]")
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "long[][]")
      val cn2Ref = ctx.addReferenceObj("ivfCn2", cn2, "long[]")
      val (i, j, c, p, qn2, dot, packed, out, v) =
        (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"),
          ctx.freshName("p"), ctx.freshName("qn2"), ctx.freshName("dot"),
          ctx.freshName("packed"), ctx.freshName("out"), ctx.freshName("v"))
      val dims = cents(0).length
      val n = cells.length
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $qn2 = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    long $v = $a.getLong($i); $qn2 += $v * $v;
         |  }
         |  if ($qn2 >= (1L << 41)) {
         |    throw new IllegalArgumentException(
         |      "IvfProbeCells: query squared norm " + $qn2 +
         |      " overflows the packed-long ordering (max " + ((1L << 41) - 1L) + ")");
         |  }
         |  long[] $packed = new long[$n];
         |  for (int $c = 0; $c < $n; $c++) {
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $dims; $j++) {
         |      $dot += $a.getLong($j) * $centsRef[$c][$j];
         |    }
         |    $packed[$c] = ($qn2 + $cn2Ref[$c] - 2L * $dot) * (1L << 20)
         |      + $cellsRef[$c];
         |  }
         |  java.util.Arrays.sort($packed);
         |  long[] $out = new long[$probes];
         |  for (int $p = 0; $p < $probes; $p++) {
         |    $out[$p] = $packed[$p] % (1L << 20);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfProbeCells =
    copy(child = newChild)
}
