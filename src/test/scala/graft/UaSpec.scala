package graft

import org.apache.spark.sql.functions._

import graft.functions.Ua

/** Real-world user-agent strings → expected families, pinning the rule
  * table's ordering (Edge/Opera contain "Chrome"; Android contains
  * "Linux"; iOS Chrome is not desktop Chrome).
  */
class UaSpec extends SparkSpec {
  import spark.implicits._

  val cases: Seq[(String, String, String, Boolean)] = Seq(
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Edge", "Windows", false),
    ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",
      "Opera", "Linux", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
      "Chrome Mobile iOS", "iOS", false),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
      "Safari", "Mac OS X", false),
    ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
      "Firefox", "Linux", false),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
      "Chrome", "Android", false),
    ("Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko",
      "IE", "Windows", false),
    ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Chrome OS", false),
    ("curl/8.4.0", "curl", "Other", false),
    ("Wget/1.21.4", "Wget", "Other", false),
    ("python-requests/2.31.0", "Python Requests", "Other", false),
    ("Python-urllib/3.11", "Python-urllib", "Other", true),  // python-urllib keyword
    ("Googlebot/2.1 (+http://www.google.com/bot.html)", "Other", "Other", true),
    ("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
      "Other", "Other", true),
    ("Datadog Agent/7.54.0", "Other", "Other", true),
    ("Pingdom.com_bot_version_1.4_(http://www.pingdom.com/)", "Other", "Other", true),
    ("Nagios-Plugins 2.3.3", "Other", "Other", true),
    ("", "Other", "Other", false))

  test("browser/os families and bot flag over a real-UA table") {
    val df = cases.map(_._1).toDF("ua").select(
      $"ua",
      Ua.browserFamily($"ua").as("b"),
      Ua.osFamily($"ua").as("o"),
      Ua.isBot($"ua").as("bot"))
    val got = df.as[(String, String, String, Boolean)].collect().toSeq
    cases.zip(got).foreach { case ((ua, eb, eo, ebot), (_, gb, go, gbot)) =>
      assert(gb === eb, s"browser for: $ua")
      assert(go === eo, s"os for: $ua")
      assert(gbot === ebot, s"bot for: $ua")
    }
  }

  test("null UA: Other families, not bot, kept by health filter") {
    val df = Seq[Option[String]](None).toDF("ua").select(
      Ua.browserFamily($"ua").as("b"), Ua.osFamily($"ua").as("o"),
      Ua.isBot($"ua").as("bot"), Ua.keepNonHealthCheck($"ua").as("keep"))
    assert(df.as[(String, String, Boolean, Boolean)].head() === (("Other", "Other", false, true)))
  }
}
