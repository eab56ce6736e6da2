package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole user-agent classification — browser family, OS family,
  * bot predicate, health-check keep predicate — as ONE kernel pass.
  *
  * The [[Ua]] `when`-chain evaluates up to 45 browser + 13 OS `rlike`
  * regexes per row plus two lowercase alternations; at the sf10 proxy
  * that held `elb_classify` at 17.2 s map-only — SLOWER than the full
  * 29-field parse — with the regex stack as the measured cost
  * (LEDGER_sf10.md round 15). Almost every rule is a literal substring
  * match, so this kernel replays the EXACT rule order with `indexOf`
  * walks over the string (plus hand-derived existence logic for the
  * six non-literal patterns, documented inline), packing the verdict
  * into one int:
  *
  *   bits 0-7 browser family index · 8-15 OS family index ·
  *   16 is_bot · 17 keep (non-health-check)
  *
  * The [[Ua]] column API decodes the packed int with `element_at` over
  * family-name literals; the four derived columns share ONE kernel
  * evaluation under codegen subexpression elimination (the
  * MarkerCounts discipline).
  *
  * Regex-semantics fidelity: `rlike` is an unanchored Java-regex find,
  * where `.` does NOT match line terminators. The fast path's
  * existence logic is exact for terminator-free input (real UAs —
  * differentially pinned by tools/ua_golden.csv and ref_diff); strings
  * CONTAINING a line terminator route the three `.*` rules through
  * the compiled original patterns, so kernel ≡ chain on ALL input
  * (UaSpec's fuzz case feeds embedded newlines to prove it).
  */
case class UaClassify(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    UaClassify.classify(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UaClassify.classify($c)")

  override protected def withNewChildInternal(newChild: Expression): UaClassify =
    copy(child = newChild)
}

object UaClassify {
  import org.apache.spark.sql.GraftBridge

  /** Family names, indexed by the packed browser idx — ORDER IS THE
    * RULE ORDER of [[Ua.browserFamilyTwin]] (uap-core precedence).
    */
  val BrowserFamilies: Seq[String] = Seq(
    "Other", "Googlebot", "bingbot", "Baiduspider", "YandexBot",
    "DuckDuckBot", "Applebot", "AhrefsBot", "SemrushBot", "PetalBot",
    "Twitterbot", "Slackbot", "FacebookBot", "UptimeRobot", "PingdomBot",
    "NewRelicPinger", "HeadlessChrome", "Electron", "Vivaldi",
    "Edge Mobile", "Edge", "Samsung Internet", "Yandex Browser",
    "UC Browser", "Opera Mini", "Opera Mobile", "Opera",
    "Chrome Mobile iOS", "Chromium", "Chrome Mobile WebView",
    "Chrome Mobile", "Chrome", "Firefox iOS", "Firefox Mobile", "Firefox",
    "IE", "Mobile Safari", "Mobile Safari UI/WKWebView", "Safari",
    "curl", "Wget", "Python Requests", "Python-urllib", "okhttp",
    "Go-http-client", "Java", "Apache-HttpClient", "Python aiohttp",
    "axios", "node-fetch")

  val OsFamilies: Seq[String] = Seq(
    "Other", "Windows Phone", "Windows", "Android", "iOS", "Mac OS X",
    "Chrome OS", "Ubuntu", "Fedora", "FreeBSD", "Tizen", "KaiOS", "Linux")

  /** Packed verdict of a NULL user agent: Other/Other, not bot, kept
    * (the reference's `na=False` keep rule, elb_logs.py:245-248).
    */
  val NullPacked: Int = 1 << 17

  private val BotKeywords = Array("bot", "crawler", "spider",
    "python-urllib", "datadog", "pingdom", "uptimerobot", "newrelic",
    "monitoring", "nagios")
  private val HealthKeywords =
    Array("datadog", "healthchecker", "kube-probe", "aws-elb")

  // the three rules whose `.*` makes line terminators semantic; the
  // slow path replays the original regexes verbatim
  private val PFirefoxMobile =
    Pattern.compile("Firefox/[0-9.]+.*(Mobile|Tablet)|(Mobile|Tablet).*Firefox/")
  private val PMobileSafari =
    Pattern.compile("(iPhone|iPad|iPod).*Version/[0-9.]+.*Safari/")
  private val PWkWebView =
    Pattern.compile("(iPhone|iPad|iPod).*AppleWebKit(?!.*Safari)")

  def classify(ua: UTF8String): Int = {
    val s = ua.toString
    val lower = ua.toLowerCase.toString
    var packed = browserIdx(s) | (osIdx(s) << 8)
    var i = 0
    var bot = false
    while (!bot && i < BotKeywords.length) {
      bot = lower.contains(BotKeywords(i)); i += 1
    }
    if (bot) packed |= 1 << 16
    i = 0
    var health = false
    while (!health && i < HealthKeywords.length) {
      health = lower.contains(HealthKeywords(i)); i += 1
    }
    if (!health) packed |= 1 << 17
    packed
  }

  /** Java regex line terminators (`.` excludes exactly these five). */
  private def hasLineTerm(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
        c == '\u2029') return true
      i += 1
    }
    false
  }

  private def digitDot(c: Char): Boolean = (c >= '0' && c <= '9') || c == '.'

  /** Does `token` occur somewhere with a non-empty maximal `[0-9.]`
    * run after it followed literally by `follow`? Exact for
    * `token[0-9.]+follow` when `follow` starts outside the class
    * (backtracking can only stop the run where the follow char
    * isn't class-eligible — here the follow strings start with ' ').
    */
  private def verSeq(s: String, token: String, follow: String): Boolean = {
    var p = s.indexOf(token)
    while (p >= 0) {
      var e = p + token.length
      val runStart = e
      while (e < s.length && digitDot(s.charAt(e))) e += 1
      if (e > runStart && s.startsWith(follow, e)) return true
      p = s.indexOf(token, p + 1)
    }
    false
  }

  /** Earliest end position over the first occurrences of the iDevice
    * tokens (iPhone/iPad/iPod) — the weakest `.*`-prefix constraint —
    * or -1 if none occur.
    */
  private def iDeviceMinEnd(s: String): Int = {
    var best = -1
    var i = s.indexOf("iPhone"); if (i >= 0) best = i + 6
    i = s.indexOf("iPad"); if (i >= 0 && (best < 0 || i + 4 < best)) best = i + 4
    i = s.indexOf("iPod"); if (i >= 0 && (best < 0 || i + 4 < best)) best = i + 4
    best
  }

  /** `(iPhone|iPad|iPod).*Version/[0-9.]+.*Safari/`: from the earliest
    * iDevice end, the EARLIEST digit-followed `Version/` leaves the
    * most room for a later `Safari/` — if it fails, every later
    * occurrence fails too.
    */
  private def mobileSafari(s: String): Boolean = {
    if (hasLineTerm(s)) return PMobileSafari.matcher(s).find()
    val e = iDeviceMinEnd(s)
    if (e < 0) return false
    var p = s.indexOf("Version/", e)
    while (p >= 0) {
      if (p + 8 < s.length && digitDot(s.charAt(p + 8)))
        return s.indexOf("Safari/", p + 9) >= 0
      p = s.indexOf("Version/", p + 1)
    }
    false
  }

  /** `(iPhone|iPad|iPod).*AppleWebKit(?!.*Safari)`: the LAST
    * AppleWebKit at/after the iDevice end maximizes the lookahead
    * start, so the pattern matches iff no `Safari` starts at or after
    * lastAppleWebKit + 11.
    */
  private def wkWebView(s: String): Boolean = {
    if (hasLineTerm(s)) return PWkWebView.matcher(s).find()
    val e = iDeviceMinEnd(s)
    if (e < 0) return false
    val j = s.lastIndexOf("AppleWebKit")
    if (j < e) return false
    s.lastIndexOf("Safari") < j + 11
  }

  /** `Firefox/[0-9.]+.*(Mobile|Tablet)|(Mobile|Tablet).*Firefox/`. */
  private def firefoxMobile(s: String): Boolean = {
    if (hasLineTerm(s)) return PFirefoxMobile.matcher(s).find()
    // branch A: earliest digit-followed Firefox/, then a token at >= p+9
    var p = s.indexOf("Firefox/")
    var a = false
    while (!a && p >= 0) {
      if (p + 8 < s.length && digitDot(s.charAt(p + 8))) {
        val lastTok =
          math.max(s.lastIndexOf("Mobile"), s.lastIndexOf("Tablet"))
        a = lastTok >= p + 9
        p = -1
      } else p = s.indexOf("Firefox/", p + 1)
    }
    if (a) return true
    // branch B: earliest token end, then a Firefox/ at >= that end
    var tokEnd = -1
    var i = s.indexOf("Mobile"); if (i >= 0) tokEnd = i + 6
    i = s.indexOf("Tablet"); if (i >= 0 && (tokEnd < 0 || i + 6 < tokEnd)) tokEnd = i + 6
    tokEnd >= 0 && s.lastIndexOf("Firefox/") >= tokEnd
  }

  /** The [[Ua.browserFamilyTwin]] rule chain, straight-line, same
    * order. Every branch comments only where the mapping from regex to
    * walk is non-obvious.
    */
  private def browserIdx(s: String): Int = {
    if (s.contains("Googlebot")) return 1
    if (s.contains("bingbot")) return 2
    if (s.contains("Baiduspider")) return 3
    if (s.contains("YandexBot")) return 4
    if (s.contains("DuckDuckBot")) return 5
    if (s.contains("Applebot")) return 6
    if (s.contains("AhrefsBot")) return 7
    if (s.contains("SemrushBot")) return 8
    if (s.contains("PetalBot")) return 9
    if (s.contains("Twitterbot")) return 10
    if (s.contains("Slackbot")) return 11
    if (s.contains("facebookexternalhit")) return 12
    if (s.contains("UptimeRobot/")) return 13
    if (s.contains("Pingdom.com_bot_version_")) return 14
    if (s.contains("NewRelicPinger/")) return 15
    if (s.contains("HeadlessChrome/")) return 16
    if (s.contains("Electron/")) return 17
    if (s.contains("Vivaldi/")) return 18
    if (s.contains("EdgiOS/") || s.contains("EdgA/")) return 19
    if (s.contains("Edg/") || s.contains("Edge/")) return 20 // Edge?/
    if (s.contains("SamsungBrowser/")) return 21
    if (s.contains("YaBrowser/")) return 22
    if (s.contains("UCBrowser/")) return 23
    if (s.contains("Opera Mini/")) return 24
    if (s.contains("Opera Mobi")) return 25
    if (s.contains("OPR/") || s.contains("Opera")) return 26
    if (s.contains("CriOS/")) return 27
    if (s.contains("Chromium/")) return 28
    if (verSeq(s, "Version/", " Chrome/")) return 29
    if (verSeq(s, "Chrome/", " Mobile")) return 30
    if (s.contains("Chrome/")) return 31
    if (s.contains("FxiOS/")) return 32
    if (firefoxMobile(s)) return 33
    if (s.contains("Firefox/")) return 34
    if (s.contains("MSIE ") || s.contains("Trident/")) return 35
    if (mobileSafari(s)) return 36
    if (wkWebView(s)) return 37
    // `Version/.*Safari/|Safari/` reduces to contains("Safari/"): the
    // second alternative subsumes the first
    if (s.contains("Safari/")) return 38
    if (s.startsWith("curl/")) return 39
    if (s.startsWith("Wget/")) return 40
    if (s.startsWith("python-requests/")) return 41
    if (s.startsWith("Python-urllib/")) return 42
    if (s.startsWith("okhttp/")) return 43
    if (s.startsWith("Go-http-client/")) return 44
    if (s.startsWith("Java/")) return 45
    if (s.contains("Apache-HttpClient/")) return 46
    if (s.startsWith("aiohttp/") || verSeq(s, "Python/", " aiohttp/")) return 47
    if (s.startsWith("axios/")) return 48
    if (s.contains("node-fetch/")) return 49
    0
  }

  private def osIdx(s: String): Int = {
    if (s.contains("Windows Phone")) return 1
    if (s.contains("Windows NT")) return 2
    if (s.contains("Android")) return 3
    if (s.contains("iPhone") || s.contains("iPad") || s.contains("iPod") ||
      s.contains("iOS")) return 4
    if (s.contains("Mac OS X")) return 5
    if (s.contains("CrOS")) return 6
    if (s.contains("Ubuntu")) return 7
    if (s.contains("Fedora")) return 8
    if (s.contains("FreeBSD")) return 9
    if (s.contains("Tizen")) return 10
    if (s.contains("KaiOS")) return 11
    if (s.contains("Linux") || s.contains("X11")) return 12
    0
  }

  /** Packed verdict column; null UA folds to [[NullPacked]]. */
  def ua_class(ua: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(
      GraftBridge.column(UaClassify(GraftBridge.expression(ua))),
      lit(NullPacked))
  }
}
