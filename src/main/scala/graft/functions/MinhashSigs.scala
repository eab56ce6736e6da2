package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All multiply–shift MinHash signatures of a doc's 60-bit shingle-hash
  * array in ONE pass: per family member s,
  * `sig_s = min over u of (A_s·u + B_s) mod 2⁴⁸` with the 24-bit-split
  * arithmetic of `graft.operators.Dedup.minhashSig` (bit-identical —
  * every product fits a signed 64-bit long, same literals as the
  * DuckDB oracle replays).
  *
  * Why a kernel: the signature table used to be a 9-way min aggregate
  * over the corpus-sized exploded shingle table — a full data-sized
  * exchange per query that consumed it. The shared shingle index
  * already materializes each doc's distinct hash array (`arr.us`), so
  * the signatures are a vocabulary-sized MAP over ~n_docs rows: this
  * expression walks the array once, updating all k running minima —
  * no explode, no shuffle, no per-seed HOF re-walk (the interpreted
  * `transform`-per-seed alternative is the exact shape round 12
  * kernelized out of the minhash path).
  *
  * CONTRACT: input is the per-doc distinct shingle-hash array (60-bit
  * non-negative longs); empty arrays yield sig = 2⁴⁸ − 1 for every
  * member (never observed through the index — a doc with zero shingles
  * never enters it).
  */
case class MinhashSigs(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length,
    s"need matching non-empty A/B constant vectors, got ${a.length}/${b.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MinhashSigs needs array<bigint> input, got $other")
  }

  private val m24 = 0xFFFFFFL
  private val m48 = 0xFFFFFFFFFFFFL

  override def nullSafeEval(input: Any): Any = {
    val us = input.asInstanceOf[ArrayData]
    val n = us.numElements()
    val k = a.length
    val mins = Array.fill(k)(m48)
    var i = 0
    while (i < n) {
      val u = us.getLong(i)
      var s = 0
      while (s < k) {
        val t1 = (a(s) * (u & m24)) & m48
        val t2 = ((a(s) & m24) * ((u >> 24) & m24)) & m24
        val sig = (t1 + (t2 << 24) + b(s)) & m48
        if (sig < mins(s)) mins(s) = sig
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashSigsA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashSigsB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, us => {
      val (n, k, mins, i, s, u, t1, t2, sig) =
        (ctx.freshName("n"), ctx.freshName("k"), ctx.freshName("mins"),
          ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("u"),
          ctx.freshName("t1"), ctx.freshName("t2"), ctx.freshName("sig"))
      s"""
         |int $n = $us.numElements();
         |int $k = $aRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${m48}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $u = $us.getLong($i);
         |  for (int $s = 0; $s < $k; $s++) {
         |    long $t1 = ($aRef[$s] * ($u & ${m24}L)) & ${m48}L;
         |    long $t2 = (($aRef[$s] & ${m24}L) * (($u >> 24) & ${m24}L)) & ${m24}L;
         |    long $sig = ($t1 + ($t2 << 24) + $bRef[$s]) & ${m48}L;
         |    if ($sig < $mins[$s]) $mins[$s] = $sig;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  /** Column API: array of the k multiply–shift minima of `us`. */
  def minhash_sigs(us: Column, a: Seq[Long], b: Seq[Long]): Column =
    GraftBridge.column(MinhashSigs(GraftBridge.expression(us), a, b))
}
