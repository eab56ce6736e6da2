package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL (non-distinct, in-order) word k-grams of a text column —
  * optionally md5-hashed — as ONE codegen'd byte walk.
  *
  * Replaces the interpreted higher-order chain
  * `transform(sequence(1, size(words) - (k-1)), i => concat_ws(" ",
  * slice(words, i, k)))` (and its `md5(...)` variant) that sat on the
  * scan path of four corpus queries (`phrase_search`, `text_lm_score`,
  * `dedup_substring`, `text_repetition`) — the per-element HOF
  * interpreter plus a `slice` allocation and a `concat_ws` per gram,
  * the exact cost profile [[WordShingles]]/[[WinnowMinMd5]]/
  * [[NormalizeText]] eliminated for their callers. Tokenization is the
  * shared convention: single-space split on the raw UTF-8 bytes, empty
  * tokens preserved (space is ASCII; continuation bytes cannot
  * false-match), each gram one byte-range copy spanning k tokens —
  * the single-space join of k consecutive tokens is the original byte
  * span verbatim. Texts with fewer than k tokens emit an EMPTY array,
  * matching the `when(size(words) >= k, ...).otherwise(array())` guard
  * at every call site (null text stays null; after the sites'
  * `explode`/`posexplode` the two are indistinguishable).
  *
  * In `hashed` mode each element is the lowercase md5 hex of the gram
  * bytes — bit-equal to `md5(concat_ws(" ", slice(...)))` — digested
  * IN PLACE from the span (no gram string materializes at all).
  * [[graft.NormalizeSpec]] pins kernel == twin on adversarial cases
  * and the documents corpus.
  */
case class PositionalGrams(child: Expression, k: Int, hashed: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    PositionalGrams.grams(v.asInstanceOf[UTF8String], k, hashed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PositionalGrams.grams($c, $k, $hashed)")

  override protected def withNewChildInternal(newChild: Expression): PositionalGrams =
    copy(child = newChild)
}

/** COUNT of distinct word k-grams — the `size(array_distinct(grams))`
  * of the Gopher repetition signal ([[graft.operators.TextAnalysis
  * .repNgramFraction]]) without materializing the gram array: one byte
  * walk, one hash-set probe per gram (exact string equality on the
  * spans — no hash-truncation caveat). `< k` tokens returns 0 (callers
  * guard on word count anyway).
  */
/** 60-bit md5-prefix LONG hash of each positional word k-gram — the
  * shuffle-width fix for corpus-scale gram joins/aggregates (round-17
  * directive on `text_lm_score`): the hashed-string mode above still
  * shuffled a 32-char hex UTF8String per gram row; this emits the
  * value the repo's SQL oracles already replay as
  * `CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)` — 8 bytes on
  * the wire instead of ~40, same one-pass in-place digest walk. The
  * 60-bit space makes cross-gram collisions a 2⁻⁶⁰-per-pair class,
  * and BOTH engines replay the identical hash, so a collision changes
  * both answers identically (the quality_filter_linear discipline).
  */
case class PositionalGramHash64(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    PositionalGrams.gramHashes64(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PositionalGrams.gramHashes64($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): PositionalGramHash64 =
    copy(child = newChild)
}

case class GramDistinctCount(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    PositionalGrams.distinctCount(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PositionalGrams.distinctCount($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramDistinctCount =
    copy(child = newChild)
}

object PositionalGrams {
  import org.apache.spark.sql.GraftBridge

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  /** Token start offsets of the single-space split (empty tokens
    * preserved, like `split(text, " ")` with limit -1). Returns the
    * offsets array sized exactly nTokens.
    */
  private def tokenStarts(bytes: Array[Byte], n: Int): Array[Int] = {
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts
  }

  private def hex16(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def grams(text: UTF8String, k: Int, hashed: Boolean): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val starts = tokenStarts(bytes, n)
    val nTokens = starts.length
    if (nTokens < k) return new GenericArrayData(Array.empty[Any])
    val m = nTokens - k + 1
    val out = new Array[Any](m)
    var g = 0
    if (hashed) {
      val digest = md.get()
      while (g < m) {
        val from = starts(g)
        val until = if (g + k < nTokens) starts(g + k) - 1 else n
        digest.update(bytes, from, until - from)
        out(g) = hex16(digest.digest())
        g += 1
      }
    } else {
      while (g < m) {
        val from = starts(g)
        val until = if (g + k < nTokens) starts(g + k) - 1 else n
        out(g) = UTF8String.fromBytes(bytes, from, until - from)
        g += 1
      }
    }
    new GenericArrayData(out)
  }

  /** The top 60 bits of md5 as a non-negative long — bit-equal to
    * `CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)` (DuckDB)
    * and `conv(substring(md5(gram), 1, 15), 16, 10)` (Spark SQL): 15
    * hex nibbles = digest bytes 0..6 plus the high nibble of byte 7.
    */
  private def top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  def gramHashes64(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val starts = tokenStarts(bytes, n)
    val nTokens = starts.length
    if (nTokens < k) return new GenericArrayData(Array.empty[Any])
    val m = nTokens - k + 1
    val out = new Array[Any](m)
    val digest = md.get()
    var g = 0
    while (g < m) {
      val from = starts(g)
      val until = if (g + k < nTokens) starts(g + k) - 1 else n
      digest.update(bytes, from, until - from)
      out(g) = top60(digest.digest())
      g += 1
    }
    new GenericArrayData(out)
  }

  def distinctCount(text: UTF8String, k: Int): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    val starts = tokenStarts(bytes, n)
    val nTokens = starts.length
    if (nTokens < k) return 0
    val seen = new java.util.HashSet[UTF8String]()
    var g = 0
    val last = nTokens - k
    while (g <= last) {
      val from = starts(g)
      val until = if (g + k < nTokens) starts(g + k) - 1 else n
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      g += 1
    }
    seen.size()
  }

  def positional_grams(text: Column, k: Int, hashed: Boolean): Column =
    GraftBridge.column(PositionalGrams(GraftBridge.expression(text), k, hashed))

  def positional_gram_hashes64(text: Column, k: Int): Column =
    GraftBridge.column(PositionalGramHash64(GraftBridge.expression(text), k))

  def gram_distinct_count(text: Column, k: Int): Column =
    GraftBridge.column(GramDistinctCount(GraftBridge.expression(text), k))
}
