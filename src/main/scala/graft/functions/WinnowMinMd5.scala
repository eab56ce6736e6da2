package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint — `min(md5(shingle))` over the word k-grams of
  * a text — as ONE codegen'd pass.
  *
  * The column twin (`array_min(transform(word_shingles(t, k), sh =>
  * md5(sh)))`) evaluates its `transform` lambda INTERPRETED per
  * element: one md5 is cheap, but the HOF machinery plus the
  * materialized shingle array and per-gram hex strings held
  * `text_fingerprint`'s winnow half at ~25 µs/row on the sf10 proxy
  * (the repo's standing lesson: any higher-order function on the
  * per-row hot path is an interpreter in the scan). Here the token
  * boundaries are scanned once on the raw UTF-8 bytes (the
  * [[WordShingles]] tokenization: single-space split, empty tokens
  * preserved, `< k` tokens collapsing to one whole-text gram), each
  * gram is digested IN PLACE from its byte span — no shingle string,
  * no array — and only the winning 16-byte digest is hex-encoded.
  *
  * Min-by-digest-bytes equals min-by-hex-string because fixed-width
  * lowercase hex is monotone in the underlying unsigned bytes.
  * Duplicate grams cannot change a minimum, so the twin's
  * distinct-shingles step is dropped. [[NormalizeSpec]] pins kernel ==
  * twin on the corpus and adversarial cases.
  */
case class WinnowMinMd5(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    WinnowMinMd5.winnow(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowMinMd5.winnow($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMinMd5 =
    copy(child = newChild)
}

object WinnowMinMd5 {
  import org.apache.spark.sql.GraftBridge

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  def winnow(text: UTF8String, k: Int): UTF8String = {
    val bytes = text.getBytes
    val n = bytes.length
    val digest = md.get()
    // token start/end offsets of the single-space split (empty tokens
    // preserved) — same walk as WordShingles.shingle
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    var best: Array[Byte] = null
    if (nTokens < k) {
      digest.update(bytes, 0, n)
      best = digest.digest()
    } else {
      // gram g spans tokens [g, g+k): start offset of token g to end
      // offset of token g+k-1. Track both with a ring of start offsets.
      val starts = new Array[Int](nTokens)
      starts(0) = 0
      var t = 1
      i = 0
      while (i < n) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
      var g = 0
      val last = nTokens - k
      while (g <= last) {
        val from = starts(g)
        // end of token g+k-1: next start minus the separator, or n
        val until = if (g + k < nTokens) starts(g + k) - 1 else n
        digest.update(bytes, from, until - from)
        val d = digest.digest()
        if (best == null || unsignedLess(d, best)) best = d
        g += 1
      }
    }
    val hex = new Array[Byte](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HEX((best(i) >> 4) & 0xf)
      hex(2 * i + 1) = HEX(best(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def winnow_min_md5(text: Column, k: Int): Column =
    GraftBridge.column(WinnowMinMd5(GraftBridge.expression(text), k))
}
