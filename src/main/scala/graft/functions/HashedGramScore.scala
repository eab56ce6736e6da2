package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear text-quality score over HASHED word n-gram features — the
  * fastText/CCNet quality-filter shape (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification"): every word unigram and
  * bigram hashes into a fixed-size bucket space, a broadcast weight
  * vector scores each bucket, and the document's score is the sum —
  * model application is ONE narrow map pass regardless of corpus size
  * (the weight vector is the entire model; at 100 TB it broadcasts
  * once per executor exactly like the PQ codebook).
  *
  * Feature extraction reuses [[PositionalGrams]]' hashed mode (md5 of
  * each in-order gram, digested in place), so the oracle re-derives
  * the identical features with `md5(gram)`; the bucket is the standard
  * 60-bit md5-prefix draw mod `weights.length`, and the weights
  * themselves come from [[HashedGramScore.deriveWeights]]' public md5
  * formula — deterministic, so DuckDB recomputes the full model
  * inline (the weights here are a structural stand-in for trained
  * coefficients; swapping in real ones changes only the array).
  *
  * Returns struct(n_grams, score_sum) — exact integers end-to-end (the
  * repo's no-float-thresholds rule); callers derive the keep gate from
  * the sign or an integer threshold.
  */
case class HashedGramScore(child: Expression, weights: Array[Long],
    ks: Seq[Int]) extends UnaryExpression {

  require(weights.nonEmpty, "need a non-empty weight vector")
  require(ks.nonEmpty && ks.forall(_ >= 1), s"gram sizes must be >= 1, got $ks")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("score_sum", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HashedGramScore needs string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val r = HashedGramScore.score(
      input.asInstanceOf[UTF8String], weights, ks.toArray)
    new GenericInternalRow(Array[Any](r(0), r(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hgsWeights", weights, "long[]")
    val kRef = ctx.addReferenceObj("hgsKs", ks.toArray, "int[]")
    nullSafeCodeGen(ctx, ev, s => {
      val r = ctx.freshName("r")
      s"""
         |long[] $r = graft.functions.HashedGramScore.score($s, $wRef, $kRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $r[0], $r[1] });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedGramScore =
    copy(child = newChild)
}

object HashedGramScore {

  /** (n_grams, score_sum) of `text`: per gram size k, walk the hashed
    * positional grams, bucket each 60-bit md5 prefix mod
    * `weights.length`, sum the bucket weights.
    */
  def score(text: UTF8String, weights: Array[Long], ks: Array[Int]): Array[Long] = {
    var n = 0L
    var sum = 0L
    var ki = 0
    while (ki < ks.length) {
      val grams: ArrayData = PositionalGrams.grams(text, ks(ki), hashed = true)
      val m = grams.numElements()
      var i = 0
      while (i < m) {
        val hex = grams.getUTF8String(i).getBytes
        // numeric value of the first 15 lowercase-hex chars = the
        // 60-bit md5-prefix draw (conv(substring(md5(g),1,15),16,10))
        var u = 0L
        var j = 0
        while (j < 15) {
          val c = hex(j)
          val v = if (c <= '9') c - '0' else c - 'a' + 10
          u = (u << 4) | v
          j += 1
        }
        sum += weights((u % weights.length).toInt)
        i += 1
      }
      n += m
      ki += 1
    }
    Array(n, sum)
  }

  /** The deterministic public-formula weight vector:
    * `w(b) = u60(md5("qw:" + b)) % 2001 − 1000` ∈ [−1000, 1000] —
    * integer milli-weights the oracle re-derives inline per bucket.
    */
  def deriveWeights(buckets: Int): Array[Long] = {
    require(buckets >= 1 && buckets <= (1 << 24),
      s"bucket count must be in [1, 2^24], got $buckets")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(buckets)(b => BootSums.u60(md, s"qw:$b") % 2001L - 1000L)
  }

  /** Column API: struct(n_grams, score_sum) of `text`. */
  def hashed_gram_score(text: Column, weights: Array[Long], ks: Seq[Int]): Column =
    GraftBridge.column(HashedGramScore(GraftBridge.expression(text), weights, ks))
}
