package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The four text-hygiene scan counts in ONE code-point walk —
  * value-identical (spec-pinned on adversarial inputs) to the regexp
  * formulations the SQL oracles keep:
  *
  *  - [0] `len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))` (punct)
  *  - [1] `len(regexp_extract_all(text, '[0-9]'))` (digits)
  *  - [2] `length(regexp_replace(text, '\s+', ''))` (non-ws chars)
  *  - [3] `size(split(trim(text), '\s+'))` (the word count, with its
  *    quirks replayed exactly: `trim` strips ' ' only, and Spark's
  *    split keeps leading AND trailing empty fields (limit −1, unlike
  *    Java's String.split), so the count is the number of maximal
  *    whitespace runs inside the trimmed bounds plus one)
  *
  * Whitespace is the JAVA `\s` set ([ \t\n\x0B\f\r]) — the engine's
  * current regexp semantics, preserved byte-for-byte. Counts are per
  * CODE POINT (non-ASCII chars are "punct", like the regexp's
  * negated ASCII class). One walk replaces four alternation/replace
  * regex passes per row in the quality/stats stack — at corpus scale
  * the text scan is the pipeline's floor.
  */
case class TextScanStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"needs string input, got ${child.dataType}")

  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var punct = 0
    var digit = 0
    var nonWs = 0
    // trim bounds: Spark trim strips ' ' only
    var lo = 0
    while (lo < n && s.charAt(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var wsRuns = 0
    var prevWs = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val ws = isWs(cp)
      if (!ws) {
        nonWs += 1
        if (cp >= '0' && cp <= '9') digit += 1
        else if (!((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')))
          punct += 1
      }
      if (i >= lo && i < hi) {
        if (ws && !prevWs) wsRuns += 1
        prevWs = ws
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(punct, digit, nonWs, wsRuns + 1))
  }

  override protected def withNewChildInternal(newChild: Expression): TextScanStats =
    copy(child = newChild)
}

object TextScanStats {
  /** Column API: [punct, digits, non-ws chars, word count]. */
  def text_scan_stats(text: Column): Column =
    GraftBridge.column(TextScanStats(GraftBridge.expression(text)))
}
