package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization as ONE codegen'd byte walk.
  *
  * Two regex-pipeline twins in the corpus hot path reduce to the same
  * shape — lowercase, map/drop the non-alphanumeric bytes, collapse
  * separator runs, trim:
  *
  *  - strip mode (`punctToSpace = false`), the fingerprint norm:
  *    `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9\\s]", ""),
  *    "\\s+", " "))` — punctuation DELETED (no word break), whitespace
  *    runs collapse to one space.
  *  - space mode (`punctToSpace = true`), the normalized-exact-dedup
  *    norm: `trim(regexp_replace(regexp_replace(lower(t),
  *    "[^a-z0-9 ]", " "), " +", " "))` — every non-alphanumeric char IS
  *    a word break.
  *
  * The regex formulations cost three full-text passes plus two
  * intermediate string materializations per row; at the sf10 proxy they
  * held `dedup_norm_exact` at ~88 s (the 2× unioned corpus) and half of
  * `text_fingerprint`'s ~37 s. This kernel lowercases once
  * (`UTF8String.toLowerCase` — the exact `lower()` semantics) and emits
  * the normalized bytes in one walk with a pending-separator flag, so
  * leading/trailing separators never materialize (the `trim`).
  *
  * Byte-level equivalence with the per-codepoint regexes holds because
  * every multi-byte UTF-8 sequence has all bytes >= 0x80: in strip mode
  * the whole sequence is deleted byte-by-byte exactly as the codepoint
  * would be; in space mode the sequence's bytes each raise the same
  * pending separator the codepoint's single replacement space would
  * (runs collapse identically). Java and RE2 both read `\s` as the
  * ASCII class `[ \t\n\x0B\f\r]`, matched here literally.
  * [[NormalizeSpec]] pins the kernel against the builtin regex twins on
  * adversarial inputs (unicode, tabs, leading/trailing/consecutive
  * separators, empty) and on the corpus.
  */
case class NormalizeText(child: Expression, punctToSpace: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NormalizeText.normalize(v.asInstanceOf[UTF8String], punctToSpace)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText.normalize($c, $punctToSpace)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  import org.apache.spark.sql.GraftBridge

  def normalize(text: UTF8String, punctToSpace: Boolean): UTF8String = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var pending = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending && o > 0) { out(o) = ' '; o += 1 }
        pending = false
        out(o) = b
        o += 1
      } else if (punctToSpace) {
        pending = true
      } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') {
        pending = true
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Builtin-regex twin of strip mode — spec pinning only (interpreted
    * regex stack; NOT for hot paths). */
  def stripTwin(text: Column): Column = {
    import org.apache.spark.sql.functions._
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))
  }

  /** Builtin-regex twin of space mode — spec pinning only. */
  def spaceTwin(text: Column): Column = {
    import org.apache.spark.sql.functions._
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))
  }

  def normalize_text(text: Column, punctToSpace: Boolean): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text), punctToSpace))
}
