package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-content extraction (the jusText/trafilatura-shaped crawl
  * stage) as a kernel: tag handling, anchor marking, line splitting,
  * entity decode, and per-line text/link statistics in plain JVM
  * string passes — the hot-path replacement for the SEVEN global regex
  * passes plus three per-line regexes of the replayable pipeline.
  *
  * The extraction RULE is defined by the regexp/replace chain (kept as
  * [[graft.operators.Html.extractColumns]], the spec twin, and
  * replayed verbatim by the DuckDB oracle):
  *
  *   1. `<script[^>]*>.*?</script>` → ' ' (body removed; ditto style)
  *   2. `<a [^>]*>` → x01 ; literal `</a>` → x02 (link marking)
  *   3. `</p>|</div>|</li>|</h[1-6]>|<br>|<br/>` → '\n' (block breaks)
  *   4. `<[^>]*>` → '' (remaining tags)
  *   5. entity decode, fixed order: &lt; &gt; &quot; &#39; &nbsp;
  *      then &amp; LAST (so `&amp;lt;` decodes to the literal `&lt;`)
  *   6. split on '\n' (trailing empties kept — line numbers are
  *      positional); per line: link codepoints from the x01/x02
  *      state machine (≡ the `x01[^x02]*x02` global match +
  *      `x01[^x02]*$` tail), content = trim(collapse ' '-runs),
  *      word count over the collapsed content.
  *
  * Regex-semantics fidelity (the [[UaClassify]] discipline): `[^>]`
  * classes cross line terminators, `.*?` does NOT — so a script/style
  * body is only removed up to the first close tag reachable without a
  * terminator, replicated here by an explicit terminator scan. The
  * spec pins kernel ≡ column chain on the corpus and on hostile
  * markup (nested anchors, unclosed tags, stray markers, entities,
  * newlines inside tags).
  *
  * Output: one struct per line — (line_no, content, n_words, n_chars,
  * link_chars, raw_chars), UNFILTERED; keep thresholds live in the
  * consuming operator so the rule table stays policy-free.
  */
case class HtmlExtractLines(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlExtractLines.Schema

  override def nullSafeEval(v: Any): Any =
    HtmlExtractLines.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlExtractLines.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtractLines =
    copy(child = newChild)
}

object HtmlExtractLines {
  import org.apache.spark.sql.GraftBridge

  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("line_no", IntegerType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false),
    StructField("raw_chars", LongType, nullable = false))),
    containsNull = false)

  private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  private def hasLineTerm(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if (isLineTerm(s.charAt(i))) return true; i += 1 }
    false
  }

  /** `<open[^>]*>.*?</close>` → ' ', global. Open end = FIRST '>'
    * (the negated class can't cross one); the lazy body may not cross
    * a line terminator, so the match exists iff the first close tag
    * after the open end has none in between. A failed attempt resumes
    * at the next occurrence of the open token, exactly like the regex
    * scan (no new open token can start inside the literal itself).
    */
  private def stripBlocks(s: String, open: String, close: String): String = {
    var p = s.indexOf(open)
    if (p < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      val gt = s.indexOf('>', p + open.length)
      var consumed = false
      if (gt >= 0) {
        val c = s.indexOf(close, gt + 1)
        if (c >= 0 && !hasLineTerm(s, gt + 1, c)) {
          sb.append(s, i, p).append(' ')
          i = c + close.length
          consumed = true
        }
      }
      p = s.indexOf(open, if (consumed) i else p + open.length)
    }
    sb.append(s, i, s.length)
    sb.toString
  }

  /** `<a [^>]*>` → x01, global (same first-'>' argument). */
  private def markAnchors(s: String): String = {
    var p = s.indexOf("<a ")
    if (p < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      val gt = s.indexOf('>', p + 3)
      if (gt >= 0) {
        sb.append(s, i, p).append('\u0001')
        i = gt + 1
        p = s.indexOf("<a ", i)
      } else p = -1
    }
    sb.append(s, i, s.length)
    sb.toString
  }

  /** `</p>|</div>|</li>|</h[1-6]>|<br>|<br/>` → '\n', global. */
  private def breakTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val m =
          if (s.startsWith("</p>", i)) 4
          else if (s.startsWith("</div>", i)) 6
          else if (s.startsWith("</li>", i)) 5
          else if (i + 4 < s.length && s.startsWith("</h", i) &&
            s.charAt(i + 3) >= '1' && s.charAt(i + 3) <= '6' &&
            s.charAt(i + 4) == '>') 5
          else if (s.startsWith("<br/>", i)) 5
          else if (s.startsWith("<br>", i)) 4
          else 0
        if (m > 0) { sb.append('\n'); i += m }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `<[^>]*>` → '', global; a '<' with no later '>' survives. */
  private def stripTags(s: String): String = {
    var p = s.indexOf('<')
    if (p < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      val gt = s.indexOf('>', p + 1)
      if (gt >= 0) {
        sb.append(s, i, p)
        i = gt + 1
        p = s.indexOf('<', i)
      } else p = -1
    }
    sb.append(s, i, s.length)
    sb.toString
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
  }

  def extract(html: UTF8String): GenericArrayData = {
    var s = html.toString
    s = stripBlocks(s, "<script", "</script>")
    s = stripBlocks(s, "<style", "</style>")
    s = markAnchors(s)
    s = s.replace("</a>", "\u0002")
    s = breakTags(s)
    s = stripTags(s)
    s = decodeEntities(s)

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lineNo = 0
    var start = 0
    var done = false
    while (!done) {
      val nl = s.indexOf('\n', start)
      val end = if (nl < 0) s.length else nl
      lineNo += 1
      out += lineStats(s, start, end, lineNo)
      if (nl < 0) done = true else start = nl + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Per-line statistics — ONE char walk: the x01/x02 link state
    * machine, marker removal, space-run collapse + trim, codepoint and
    * word counts.
    */
  private def lineStats(s: String, from: Int, until: Int,
      lineNo: Int): InternalRow = {
    val content = new java.lang.StringBuilder(until - from)
    var linkChars = 0L
    var rawChars = 0L
    var inLink = false
    var pendingSpace = false
    var nWords = 0
    var nChars = 0L
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c == '\u0001') {
        if (inLink) linkChars += 1 // inner opener counts as segment content
        else inLink = true
      } else if (c == '\u0002') {
        if (inLink) inLink = false
        // stray closer outside a segment: dropped, counts nowhere
      } else {
        if (!Character.isLowSurrogate(c)) rawChars += 1
        if (inLink && !Character.isLowSurrogate(c)) linkChars += 1
        if (c == ' ') pendingSpace = true
        else {
          if (pendingSpace && content.length > 0) {
            content.append(' '); nChars += 1
          }
          pendingSpace = false
          if (content.length == 0) nWords = 1
          else if (content.charAt(content.length - 1) == ' ') nWords += 1
          content.append(c)
          if (!Character.isLowSurrogate(c)) nChars += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      lineNo, UTF8String.fromString(content.toString),
      nWords, nChars, linkChars, rawChars))
  }

  def html_extract_lines(html: Column): Column =
    GraftBridge.column(HtmlExtractLines(GraftBridge.expression(html)))
}
