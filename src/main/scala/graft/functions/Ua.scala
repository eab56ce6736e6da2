package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent classification as pure column expressions.
  *
  * The reference leans on the `user_agents` Python library
  * (reference elb_logs.py:16,119-121) for `ua_browser_family` /
  * `ua_os_family` with an `'Other'` fallback. We re-express the rule
  * table as a `when`-chain over codegen'd `rlike` predicates — no UDF, so
  * the whole projection stays inside WholeStageCodegen. The rule subset
  * covers the major browser/OS families; anything unmatched is `Other`
  * (the golden test pins "Datadog Agent/7.54.0" → Other/Other,
  * reference tests/test_elb_logs.py:26).
  *
  * Order matters: Edge/Opera UAs also contain "Chrome", Android UAs also
  * contain "Linux" — more specific rules come first, mirroring how
  * ua-parser orders its regexes.
  */
object Ua {

  /** The packed [[UaClassify]] kernel verdict — ONE string walk per
    * row replaces the whole regex stack below (round 16: elb_classify
    * was 17.2 s sf10 map-only, slower than the full 29-field parse,
    * and the `when`-chain's 58 rlike evaluations were the measured
    * cost). The four public functions decode it; being the same
    * deterministic expression, they collapse to one evaluation per
    * projection under codegen subexpression elimination. The original
    * chains survive as [[browserFamilyTwin]]/[[osFamilyTwin]]/
    * [[isBotTwin]]/[[keepNonHealthCheckTwin]] — UaSpec pins kernel ≡
    * twin on the golden UA table and on adversarial fuzz (including
    * embedded line terminators), and ref_diff pins both against the
    * reference pipeline itself.
    */
  private def packed(ua: Column): Column = UaClassify.ua_class(ua)

  def browserFamily(ua: Column): Column =
    element_at(
      typedLit(UaClassify.BrowserFamilies),
      packed(ua).bitwiseAND(lit(255)) + 1)

  def osFamily(ua: Column): Column =
    element_at(
      typedLit(UaClassify.OsFamilies),
      shiftright(packed(ua), 8).bitwiseAND(lit(255)) + 1)

  /** Bot predicate — any of the reference's 11 lowercase keywords in the
    * UA (reference elb_logs.py:122-126). `bot` subsumes `googlebot`.
    */
  def isBot(ua: Column): Column =
    shiftright(packed(ua), 16).bitwiseAND(lit(1)) === 1

  /** Health-check exclusion predicate: true ⇒ KEEP the row. Null UA is
    * kept (the reference's `na=False`, elb_logs.py:245-248).
    */
  def keepNonHealthCheck(ua: Column): Column =
    shiftright(packed(ua), 17).bitwiseAND(lit(1)) === 1

  def browserFamilyTwin(ua: Column): Column =
    when(ua.isNull, lit("Other"))
      // Named crawlers first — uap-core gives the big bots their own
      // families, and Googlebot-Smartphone embeds a full Chrome UA, so
      // these must precede every browser rule.
      .when(ua.rlike("Googlebot"), lit("Googlebot"))
      .when(ua.rlike("bingbot"), lit("bingbot"))
      .when(ua.rlike("Baiduspider"), lit("Baiduspider"))
      .when(ua.rlike("YandexBot"), lit("YandexBot"))
      .when(ua.rlike("DuckDuckBot"), lit("DuckDuckBot"))
      .when(ua.rlike("Applebot"), lit("Applebot"))
      .when(ua.rlike("AhrefsBot"), lit("AhrefsBot"))
      .when(ua.rlike("SemrushBot"), lit("SemrushBot"))
      .when(ua.rlike("PetalBot"), lit("PetalBot"))
      .when(ua.rlike("Twitterbot"), lit("Twitterbot"))
      .when(ua.rlike("Slackbot"), lit("Slackbot"))
      .when(ua.rlike("facebookexternalhit"), lit("FacebookBot"))
      // Monitoring agents uap-core names (regexes.yaml has dedicated
      // rules for each; spellings are the public family_replacements)
      .when(ua.rlike("UptimeRobot/"), lit("UptimeRobot"))
      .when(ua.rlike("Pingdom\\.com_bot_version_"), lit("PingdomBot"))
      .when(ua.rlike("NewRelicPinger/"), lit("NewRelicPinger"))
      // Headless/embedded Chromium carries Chrome tokens too
      .when(ua.rlike("HeadlessChrome/"), lit("HeadlessChrome"))
      .when(ua.rlike("Electron/"), lit("Electron"))
      .when(ua.rlike("Vivaldi/"), lit("Vivaldi"))
      // Chromium-derived mobile browsers embed a full Chrome UA — their
      // own token must win before any Chrome rule (ua-parser order).
      .when(ua.rlike("EdgiOS/|EdgA/"), lit("Edge Mobile"))
      .when(ua.rlike("Edge?/"), lit("Edge"))
      .when(ua.rlike("SamsungBrowser/"), lit("Samsung Internet"))
      .when(ua.rlike("YaBrowser/"), lit("Yandex Browser"))
      .when(ua.rlike("UCBrowser/"), lit("UC Browser"))
      .when(ua.rlike("Opera Mini/"), lit("Opera Mini"))
      .when(ua.rlike("Opera Mobi"), lit("Opera Mobile"))
      .when(ua.rlike("OPR/|Opera"), lit("Opera"))
      .when(ua.rlike("CriOS/"), lit("Chrome Mobile iOS"))
      .when(ua.rlike("Chromium/"), lit("Chromium"))
      // Android WebView carries both Version/ and Chrome/ tokens; plain
      // Android Chrome carries Chrome/… Mobile. Both precede desktop
      // Chrome, mirroring uap-core's regex order.
      .when(ua.rlike("Version/[0-9.]+ Chrome/"), lit("Chrome Mobile WebView"))
      .when(ua.rlike("Chrome/[0-9.]+ Mobile"), lit("Chrome Mobile"))
      .when(ua.rlike("Chrome/"), lit("Chrome"))
      .when(ua.rlike("FxiOS/"), lit("Firefox iOS"))
      .when(ua.rlike("Firefox/[0-9.]+.*(Mobile|Tablet)|(Mobile|Tablet).*Firefox/"),
        lit("Firefox Mobile"))
      .when(ua.rlike("Firefox/"), lit("Firefox"))
      .when(ua.rlike("MSIE |Trident/"), lit("IE"))
      .when(ua.rlike("(iPhone|iPad|iPod).*Version/[0-9.]+.*Safari/"),
        lit("Mobile Safari"))
      // iOS WebView: AppleWebKit WITHOUT a Safari/ token (uap-core's
      // "Mobile Safari UI/WKWebView" family) — must follow the Mobile
      // Safari rule and precede the generic Safari rule
      .when(ua.rlike("(iPhone|iPad|iPod).*AppleWebKit(?!.*Safari)"),
        lit("Mobile Safari UI/WKWebView"))
      .when(ua.rlike("Version/.*Safari/|Safari/"), lit("Safari"))
      .when(ua.rlike("^curl/"), lit("curl"))
      .when(ua.rlike("^Wget/"), lit("Wget"))
      .when(ua.rlike("^python-requests/"), lit("Python Requests"))
      .when(ua.rlike("^Python-urllib/"), lit("Python-urllib"))
      // API/SDK clients — the families uap-core names for machine
      // traffic, common in load-balancer logs
      .when(ua.rlike("^okhttp/"), lit("okhttp"))
      .when(ua.rlike("^Go-http-client/"), lit("Go-http-client"))
      .when(ua.rlike("^Java/"), lit("Java"))
      .when(ua.rlike("Apache-HttpClient/"), lit("Apache-HttpClient"))
      .when(ua.rlike("^aiohttp/|Python/[0-9.]+ aiohttp/"), lit("Python aiohttp"))
      .when(ua.rlike("^axios/"), lit("axios"))
      .when(ua.rlike("node-fetch/"), lit("node-fetch"))
      .otherwise(lit("Other"))

  def osFamilyTwin(ua: Column): Column =
    when(ua.isNull, lit("Other"))
      .when(ua.rlike("Windows Phone"), lit("Windows Phone"))
      .when(ua.rlike("Windows NT"), lit("Windows"))
      .when(ua.rlike("Android"), lit("Android"))
      .when(ua.rlike("iPhone|iPad|iPod|iOS"), lit("iOS"))
      .when(ua.rlike("Mac OS X"), lit("Mac OS X"))
      .when(ua.rlike("CrOS"), lit("Chrome OS"))
      // named distros precede the generic Linux rule, as in uap-core
      .when(ua.rlike("Ubuntu"), lit("Ubuntu"))
      .when(ua.rlike("Fedora"), lit("Fedora"))
      .when(ua.rlike("FreeBSD"), lit("FreeBSD"))
      .when(ua.rlike("Tizen"), lit("Tizen"))
      .when(ua.rlike("KaiOS"), lit("KaiOS"))
      .when(ua.rlike("Linux|X11"), lit("Linux"))
      .otherwise(lit("Other"))

  def isBotTwin(ua: Column): Column =
    coalesce(
      lower(ua).rlike(
        "bot|crawler|spider|python-urllib|datadog|pingdom|uptimerobot|newrelic|monitoring|nagios"),
      lit(false))

  def keepNonHealthCheckTwin(ua: Column): Column =
    !coalesce(lower(ua).rlike("datadog|healthchecker|kube-probe|aws-elb"), lit(false))
}
