package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd set-intersection SIZE of two ASCENDING-sorted
  * `array<bigint>` columns — the verify kernel of the set-similarity
  * joins ([[graft.operators.Dedup.prefixFilterJoin]] /
  * `containmentPairs`).
  *
  * The builtin `size(array_intersect(a, b))` materializes the
  * intersection ARRAY through a per-row `OpenHashSet[Any]` — every
  * long element boxes on insert AND probe, and the set + result array
  * allocate per candidate pair. On a verify stage evaluating millions
  * of candidate pairs × hundreds of elements that allocation/boxing
  * is the dominant CPU (round-13 profile: 762 CPU-seconds in
  * dedup_containment's verify stage at sf10). Sorted inputs admit the
  * two-pointer merge count: zero allocation, primitive compares only.
  *
  * CONTRACT: both arrays must be sorted ascending with no null
  * elements (the callers build them via `sort_array(collect_list(u))`
  * over distinct per-doc hashes). Duplicate elements count like the
  * multiset merge — equal to set semantics when inputs are distinct,
  * which callers guarantee. Unsorted input returns an undefined count
  * (garbage-in — same posture as any merge-join on unsorted runs).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(LongType, false) || t == ArrayType(LongType, true)
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SortedIntersectCount needs array<bigint> inputs, got (${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1L; i += 1; j += 1 }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (na, nb, i, j, x, y) =
        (ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"),
          ctx.freshName("j"), ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else { ${ev.value}++; $i++; $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.GraftBridge

  /** Column API: |a ∩ b| of two ascending-sorted bigint arrays. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
