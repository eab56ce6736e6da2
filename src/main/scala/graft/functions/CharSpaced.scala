package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE seed tokenization `word → " w o r d "` as ONE codegen'd byte
  * walk — every character space-separated, with a leading and trailing
  * space so merge application can match `" p1 p2 "` at word
  * boundaries ([[graft.operators.Bpe]]).
  *
  * Replaces the interpreted
  * `concat(' ', array_join(transform(sequence(1, length(w)),
  * i -> substring(w, i, 1)), ' '), ' ')` chain — a per-character
  * lambda invocation plus an array materialization per word, run over
  * the whole vocabulary at train start. The walk steps CODEPOINT
  * boundaries (a UTF-8 char = one leading byte + its continuation
  * bytes in 0x80–0xBF), which is exactly the unit `substring(w, i, 1)`
  * and DuckDB's `substr` count, so multi-byte characters come out as
  * single symbols byte-identically to the HOF twin ([[charSpacedTwin]],
  * spec-pinned in BpeSpec and fuzz-pinned in PropertySpec).
  */
case class CharSpaced(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    CharSpaced.spaced(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharSpaced.spaced($c)")

  override protected def withNewChildInternal(newChild: Expression): CharSpaced =
    copy(child = newChild)
}

object CharSpaced {
  import org.apache.spark.sql.GraftBridge

  private def isContinuation(b: Byte): Boolean = (b & 0xC0) == 0x80

  def spaced(word: UTF8String): UTF8String = {
    val bytes = word.getBytes
    val n = bytes.length
    if (n == 0) {
      // the HOF twin's degenerate output for "": sequence(1, 0) steps
      // DOWN to [1, 0], both substrings are "", array_join gives " ",
      // wrapped = "   ". Unreachable from Bpe (empty words are
      // filtered) but pinned for exact twin equality.
      return UTF8String.fromString("   ")
    }
    // one space before every char plus the trailing space
    var chars = 0
    var i = 0
    while (i < n) { if (!isContinuation(bytes(i))) chars += 1; i += 1 }
    val out = new Array[Byte](n + chars + 1)
    var o = 0
    i = 0
    while (i < n) {
      if (!isContinuation(bytes(i))) { out(o) = ' '; o += 1 }
      out(o) = bytes(i)
      o += 1
      i += 1
    }
    out(o) = ' '
    UTF8String.fromBytes(out)
  }

  /** The builtin-HOF twin — spec pinning only (interpreted lambda per
    * character; NOT for hot paths).
    */
  def charSpacedTwin(colName: String): Column = {
    import org.apache.spark.sql.functions._
    concat(lit(" "),
      array_join(expr(
        s"transform(sequence(1, length($colName)), i -> substring($colName, i, 1))"),
        " "),
      lit(" "))
  }

  def char_spaced(word: Column): Column =
    GraftBridge.column(CharSpaced(GraftBridge.expression(word)))
}
