package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization codec expressions over a DRIVER-SIDE codebook.
  *
  * A PQ codebook is tiny (subspaces × codebookSize subvectors — a few
  * thousand longs even at production dials), so the scale-correct way
  * to encode a 100 TB corpus is NOT a join against a codebook table
  * (that fans every row out ×codebookSize through an exchange) but a
  * single map pass with the codebook baked into the operator — exactly
  * how FAISS ships codebooks to its scan kernels. These expressions
  * carry the codebook as a codegen reference object; encoding a vector
  * is a tight triple loop (subspace × code × dim) with zero
  * allocation beyond the output array, inside whole-stage codegen.
  *
  * Layout: `codebook(s * codebookSize + c)` = the dsub-long subvector
  * of code c in subspace s. Distances are exact integer squared L2 on
  * the quantized domain — Σᵢ(qᵢ−cᵢ)² ≡ ‖q‖²+‖c‖²−2q·c, the identical
  * value the join-shaped formulation and the SQL oracle compute —
  * and argmin ties break to the smaller code index.
  */
object PqCodec {

  /** codes[s] = argmin_c Σᵢ (q[s·dsub+i] − cb[s,c][i])², ties low. */
  def pq_codes(q: Column, codebook: Array[Array[Long]], subspaces: Int,
      dsub: Int): Column =
    GraftBridge.column(
      PqCodes(GraftBridge.expression(q), codebook, subspaces, dsub))

  /** lut[s][c] = exact integer L2² between q's subvector s and code c. */
  def pq_lut(q: Column, codebook: Array[Array[Long]], subspaces: Int,
      dsub: Int): Column =
    GraftBridge.column(
      PqLut(GraftBridge.expression(q), codebook, subspaces, dsub))

  /** Σ_s lut[s][codes[s]] — the ADC distance of a (codes, lut) pair. */
  def pq_adc(codes: Column, luts: Column): Column =
    GraftBridge.column(
      PqAdc(GraftBridge.expression(codes), GraftBridge.expression(luts)))
}

private[graft] trait PqCodebookExpr { self: UnaryExpression =>
  def codebook: Array[Array[Long]]
  def subspaces: Int
  def dsub: Int
  def codebookSize: Int = codebook.length / subspaces
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(LongType, false) || t == ArrayType(LongType, true)
    if (!ok(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"needs array<bigint> input, got ${child.dataType}")
    else if (subspaces <= 0 || codebook.length % subspaces != 0 ||
        codebook.exists(_.length != dsub))
      TypeCheckResult.TypeCheckFailure(
        s"codebook must be ${subspaces}×k subvectors of $dsub longs")
    else TypeCheckResult.TypeCheckSuccess
  }
}

case class PqCodes(child: Expression, codebook: Array[Array[Long]],
    subspaces: Int, dsub: Int)
    extends UnaryExpression with PqCodebookExpr {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != subspaces * dsub) return null
    val k = codebookSize
    val codes = new Array[Int](subspaces)
    var s = 0
    while (s < subspaces) {
      var best = Long.MaxValue
      var bc = 0
      var c = 0
      while (c < k) {
        val cb = codebook(s * k + c)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = a.getLong(s * dsub + i) - cb(i)
          d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bc = c }
        c += 1
      }
      codes(s) = bc
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[][]")
      val (s, c, i, d, diff, best, bc, codes) =
        (ctx.freshName("s"), ctx.freshName("c"), ctx.freshName("i"),
          ctx.freshName("d"), ctx.freshName("diff"), ctx.freshName("best"),
          ctx.freshName("bc"), ctx.freshName("codes"))
      val k = codebookSize
      s"""
         |if ($a.numElements() != ${subspaces * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$subspaces];
         |  for (int $s = 0; $s < $subspaces; $s++) {
         |    long $best = Long.MAX_VALUE; int $bc = 0;
         |    for (int $c = 0; $c < $k; $c++) {
         |      long[] _cb = $cb[$s * $k + $c];
         |      long $d = 0L;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        long $diff = $a.getLong($s * $dsub + $i) - _cb[$i];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $best) { $best = $d; $bc = $c; }
         |    }
         |    $codes[$s] = $bc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

case class PqLut(child: Expression, codebook: Array[Array[Long]],
    subspaces: Int, dsub: Int)
    extends UnaryExpression with PqCodebookExpr {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != subspaces * dsub) return null
    val k = codebookSize
    val luts = new Array[ArrayData](subspaces)
    var s = 0
    while (s < subspaces) {
      val row = new Array[Long](k)
      var c = 0
      while (c < k) {
        val cb = codebook(s * k + c)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = a.getLong(s * dsub + i) - cb(i)
          d += diff * diff
          i += 1
        }
        row(c) = d
        c += 1
      }
      luts(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(luts.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[][]")
      val (s, c, i, d, diff, row, luts) =
        (ctx.freshName("s"), ctx.freshName("c"), ctx.freshName("i"),
          ctx.freshName("d"), ctx.freshName("diff"), ctx.freshName("row"),
          ctx.freshName("luts"))
      val k = codebookSize
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |if ($a.numElements() != ${subspaces * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  $ad[] $luts = new $ad[$subspaces];
         |  for (int $s = 0; $s < $subspaces; $s++) {
         |    long[] $row = new long[$k];
         |    for (int $c = 0; $c < $k; $c++) {
         |      long[] _cb = $cb[$s * $k + $c];
         |      long $d = 0L;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        long $diff = $a.getLong($s * $dsub + $i) - _cb[$i];
         |        $d += $diff * $diff;
         |      }
         |      $row[$c] = $d;
         |    }
         |    $luts[$s] = new $gad($row);
         |  }
         |  ${ev.value} = new $gad((Object[]) $luts);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC sum: codes is array<int> (length S), luts array<array<bigint>>
  * (S rows, one distance per code) — result Σ_s luts[s][codes[s]].
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val okCodes = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val okLuts = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (okCodes && okLuts) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PqAdc needs (array<int>, array<array<bigint>>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val luts = r.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (luts.numElements() != n) return null
    var acc = 0L
    var s = 0
    while (s < n) {
      acc += luts.getArray(s).getLong(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, luts) => {
      val (s, n) = (ctx.freshName("s"), ctx.freshName("n"))
      s"""
         |int $n = $codes.numElements();
         |${ev.value} = 0L;
         |if ($luts.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $s = 0; $s < $n; $s++) {
         |    ${ev.value} += $luts.getArray($s).getLong($codes.getInt($s));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
