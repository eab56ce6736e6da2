package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as ONE codegen'd kernel.
  *
  * The builtin-column twin ([[graft.operators.Urls.canonicalUrlColumns]])
  * is semantically right but evaluates its `filter`/`sort_array`
  * higher-order functions INTERPRETED, per query parameter, per row —
  * plus a regex pass for the trailing slashes — which held
  * `url_normalize` at ~12 µs/row (124 s over the 10 M-row sf10 corpus,
  * the slowest linear scan in the suite after the ELB parse). This
  * expression does one walk over the UTF8String with byte-level
  * delimiter scans and an insertion sort over the (few) surviving
  * parameters, and stays inside whole-stage codegen.
  *
  * Rule-for-rule identical to the column twin — same
  * `substring_index` first/last-occurrence semantics, same
  * `UTF8String.toLowerCase`, same binary `sort_array` order, same
  * degrade-per-rule behavior on malformed input ([[UrlSpec]] pins the
  * kernel against the twin on the adversarial cases, and the DuckDB
  * oracle rebuilds the twin's algebra independently).
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    CanonicalUrl.canon(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonicalUrl.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object CanonicalUrl {
  import org.apache.spark.sql.GraftBridge

  private val SEP = UTF8String.fromString("://")
  private val HASH = UTF8String.fromString("#")
  private val SLASH = UTF8String.fromString("/")
  private val QMARK = UTF8String.fromString("?")
  private val COLON = UTF8String.fromString(":")
  private val AMP = UTF8String.fromString("&")
  private val UTM = UTF8String.fromString("utm_")
  private val HTTPS = UTF8String.fromString("https")
  private val HTTP = UTF8String.fromString("http")
  private val P443 = UTF8String.fromString("443")
  private val P80 = UTF8String.fromString("80")
  private val EMPTY = UTF8String.EMPTY_UTF8

  /** substring_index(s, d, 1): prefix before the FIRST occurrence of
    * `d` (the whole string when absent) — char indices, like Spark's.
    */
  private def beforeFirst(s: UTF8String, d: UTF8String): UTF8String = {
    val i = s.indexOf(d, 0)
    if (i < 0) s else s.substring(0, i)
  }

  /** substring_index(s, d, -1): suffix after the LAST occurrence. */
  private def afterLast(s: UTF8String, d: UTF8String): UTF8String = {
    var last = -1
    var i = s.indexOf(d, 0)
    while (i >= 0) { last = i; i = s.indexOf(d, i + 1) }
    if (last < 0) s else s.substring(last + d.numChars, s.numChars)
  }

  def canon(u: UTF8String): UTF8String = {
    val noFrag = beforeFirst(u, HASH)
    val scheme = beforeFirst(noFrag, SEP).toLowerCase
    val rest = afterLast(noFrag, SEP)
    val hostPort = beforeFirst(rest, SLASH)
    // rest.substr(len(hostPort)+1, …): everything from the first '/'
    val pathQ = rest.substring(hostPort.numChars, rest.numChars)
    val path = beforeFirst(pathQ, QMARK)
    val rawQ =
      if (pathQ.indexOf(QMARK, 0) >= 0) afterLast(pathQ, QMARK) else EMPTY
    val host = beforeFirst(hostPort, COLON).toLowerCase
    val port =
      if (hostPort.indexOf(COLON, 0) >= 0) afterLast(hostPort, COLON)
      else EMPTY
    val keepPort = port.numBytes > 0 &&
      !(scheme.equals(HTTPS) && port.equals(P443)) &&
      !(scheme.equals(HTTP) && port.equals(P80))
    // regexp_replace(path, "/+$", "")
    var cleanPath = path
    while (cleanPath.numBytes > 0 &&
        cleanPath.getByte(cleanPath.numBytes - 1) == '/')
      cleanPath = cleanPath.substring(0, cleanPath.numChars - 1)
    // split('&') → drop empties and utm_* → binary sort → join('&')
    val kept = new java.util.ArrayList[UTF8String](8)
    var start = 0
    val nq = rawQ.numChars
    while (start <= nq && nq > 0) {
      val next = rawQ.indexOf(AMP, start)
      val end = if (next < 0) nq else next
      if (end > start) {
        val p = rawQ.substring(start, end)
        if (!p.startsWith(UTM)) kept.add(p)
      }
      if (next < 0) start = nq + 1 else start = next + 1
    }
    val params = new Array[UTF8String](kept.size)
    kept.toArray(params)
    java.util.Arrays.sort(params,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val parts = new java.util.ArrayList[UTF8String](8)
    parts.add(scheme); parts.add(SEP); parts.add(host)
    if (keepPort) { parts.add(COLON); parts.add(port) }
    parts.add(cleanPath)
    if (params.length > 0) {
      parts.add(QMARK)
      var i = 0
      while (i < params.length) {
        if (i > 0) parts.add(AMP)
        parts.add(params(i))
        i += 1
      }
    }
    UTF8String.concat(parts.toArray(new Array[UTF8String](parts.size)): _*)
  }

  def canonical_url(c: Column): Column =
    GraftBridge.column(CanonicalUrl(GraftBridge.expression(c)))
}
