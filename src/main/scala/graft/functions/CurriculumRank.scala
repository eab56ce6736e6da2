package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-robin curriculum interleave rank as a codegen kernel over the
  * DRIVER-SIDE per-(stage, source) count table — the
  * [[IvfProbeCells]] pattern: a tiny trained/collected array baked
  * into a tight primitive loop instead of a per-row interpreted
  * higher-order-function chain.
  *
  * The rank of the row at within-(stage, source) position `pos` is
  *
  *   Σ_{s'} min(pos−1, c_{s'})  +  |{s' ≤ source : c_{s'} ≥ pos}|
  *
  * over the sources of the row's stage — rows of earlier round-robin
  * rounds, plus earlier-or-equal sources still alive in this round
  * (`Curriculum.curriculumOrder`'s interleave contract, pinned equal
  * to the windowed per-stage `row_number` twin by CurriculumSpec).
  * The round-12 formulation evaluated TWO interpreted `aggregate` HOF
  * lambdas per corpus row over a broadcast-joined struct array —
  * O(|sources|) interpreted Column evaluation per row, the exact
  * per-row-interpreter cost this repo has kernelized elsewhere
  * (`minhashSignatureTable`, `Dsir` gram explode). Here the same
  * O(|sources|) loop runs as primitive long arithmetic, and the
  * broadcast join disappears entirely — the count table rides in as
  * reference objects.
  *
  * `sources` is ordered by Spark's BINARY string order (UTF8String
  * byte comparison — what `s' ≤ source` means in the Column twin) and
  * `counts(stage − 1)(srcIdx)` is the count table, zero-padded for
  * (stage, source) combinations with no rows: a zero count adds
  * min(pos−1, 0) = 0 and can never reach `c ≥ pos` at pos ≥ 1, so
  * padding is exact.
  *
  * An unknown source or out-of-range stage throws: the table is
  * collected from the SAME deterministic frame the kernel then runs
  * over, so a miss means model/corpus drift — fail loud, never rank
  * garbage.
  */
case class CurriculumRank(
    first: Expression,   // stage ∈ [1, counts.length]
    second: Expression,  // pos ≥ 1 (within-(stage, source) position)
    third: Expression,   // source name
    sources: Array[String],
    counts: Array[Array[Long]])
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  @transient private lazy val srcKeys: Array[UTF8String] =
    sources.map(UTF8String.fromString)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"stage must be int, got ${first.dataType}")
    else if (second.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"pos must be int, got ${second.dataType}")
    else if (third.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"source must be string, got ${third.dataType}")
    else if (counts.exists(_.length != sources.length))
      TypeCheckResult.TypeCheckFailure(
        "every stage's count row must align with the source table")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def srcIndex(s: UTF8String): Int = {
    var lo = 0
    var hi = srcKeys.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val cmp = srcKeys(mid).compareTo(s)
      if (cmp == 0) return mid
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    throw new IllegalArgumentException(
      s"CurriculumRank: source '$s' absent from the collected count table")
  }

  override def nullSafeEval(stage: Any, pos: Any, src: Any): Any = {
    val st = stage.asInstanceOf[Int] - 1
    if (st < 0 || st >= counts.length)
      throw new IllegalArgumentException(
        s"CurriculumRank: stage ${st + 1} outside [1, ${counts.length}]")
    val idx = srcIndex(src.asInstanceOf[UTF8String])
    val c = counts(st)
    val p = pos.asInstanceOf[Int].toLong
    var rank = 0L
    var j = 0
    while (j < c.length) {
      rank += math.min(p - 1L, c(j))
      if (j <= idx && c(j) >= p) rank += 1L
      j += 1
    }
    rank
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (stage, pos, src) => {
      val srcRef = ctx.addReferenceObj("currSources", srcKeys,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val cntRef = ctx.addReferenceObj("currCounts", counts, "long[][]")
      val (st, lo, hi, mid, cmp, idx, c, p, j) =
        (ctx.freshName("st"), ctx.freshName("lo"), ctx.freshName("hi"),
          ctx.freshName("mid"), ctx.freshName("cmp"), ctx.freshName("idx"),
          ctx.freshName("c"), ctx.freshName("p"), ctx.freshName("j"))
      s"""
         |int $st = $stage - 1;
         |if ($st < 0 || $st >= ${counts.length}) {
         |  throw new IllegalArgumentException(
         |    "CurriculumRank: stage " + ($st + 1) + " outside [1, ${counts.length}]");
         |}
         |int $lo = 0; int $hi = ${sources.length} - 1; int $idx = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  int $cmp = $srcRef[$mid].compareTo($src);
         |  if ($cmp == 0) { $idx = $mid; break; }
         |  else if ($cmp < 0) { $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |if ($idx < 0) {
         |  throw new IllegalArgumentException(
         |    "CurriculumRank: source '" + $src + "' absent from the collected count table");
         |}
         |long[] $c = $cntRef[$st];
         |long $p = (long) $pos;
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $c.length; $j++) {
         |  ${ev.value} += Math.min($p - 1L, $c[$j]);
         |  if ($j <= $idx && $c[$j] >= $p) { ${ev.value} += 1L; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CurriculumRank =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CurriculumRank {

  /** Column API: the interleave rank of (stage, pos, source) given the
    * collected per-(stage, source) count matrix.
    */
  def curriculum_rank(stage: Column, pos: Column, source: Column,
      sources: Array[String], counts: Array[Array[Long]]): Column =
    GraftBridge.column(CurriculumRank(
      GraftBridge.expression(stage), GraftBridge.expression(pos),
      GraftBridge.expression(source), sources, counts))
}
