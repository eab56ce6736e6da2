package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column, as one codegen'd pass.
  *
  * Semantics are EXACTLY the builtin formulation it replaces
  * (`array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text, " "), i+1, k))))`, short texts collapsing to a
  * single whole-text shingle): split on single spaces keeping empty
  * tokens, k-grams joined by one space, first-occurrence order. The
  * builtin chain is a higher-order function — interpreted per element,
  * with a `slice` allocation and a `concat_ws` per gram — and sits on
  * the hot path of five operators (MinHash signatures, LSH bands,
  * n-gram Jaccard, winnowing, decontamination). Here the token
  * boundaries are scanned once and each gram is one substring copy;
  * `doGenCode` emits a static call so the surrounding projection stays
  * inside whole-stage codegen (same pattern as [[ElbParseFields]]).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    WordShingles.shingle(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingle($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.GraftBridge

  /** One-pass distinct k-shingling. Token boundaries are found on the
    * raw UTF-8 bytes (space is ASCII; continuation bytes cannot
    * false-match), each gram is a single byte-range copy spanning k
    * tokens, and distinctness is a hash set in first-occurrence order.
    */
  def shingle(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token start/end offsets of the single-space split (empty tokens
    // preserved, like split(text, " ") with limit -1)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokenStart = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        starts.add(tokenStart); ends.add(i)
        tokenStart = i + 1
      }
      i += 1
    }
    val nTokens = starts.size()
    if (nTokens < k) {
      // whole-text shingle: the single-space join of all tokens is the
      // original text verbatim
      return new GenericArrayData(Array[Any](text.clone()))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    val last = nTokens - k
    while (g <= last) {
      val from = starts.get(g)
      val until = ends.get(g + k - 1)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      g += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def word_shingles(text: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), k))
}
