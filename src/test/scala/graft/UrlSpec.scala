package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalUrl(col("url"))).as[String].collect().toSeq

  test("canonicalUrl: case, default port, utm params, fragment, trailing slash") {
    assert(canon(
      "HTTPS://Example.COM:443/A/b/?utm_source=x&z=2&a=1&utm_campaign=q#frag",
      "https://example.com/A/b?a=1&z=2",
      "http://Example.com:80/p",
      "http://example.com:8080/p",         // nonstandard port survives
      "https://example.com/p?utm_source=x" // all params dropped -> no '?'
    ) === Seq(
      "https://example.com/A/b?a=1&z=2",
      "https://example.com/A/b?a=1&z=2",
      "http://example.com/p",
      "http://example.com:8080/p",
      "https://example.com/p"))
  }

  test("canonicalUrl: variants of one resource collapse to a single form") {
    val variants = Seq(
      "https://CDN.Site.io/x/y?b=2&a=1",
      "HTTPS://cdn.site.io/x/y/?a=1&b=2#top",
      "https://cdn.site.io:443/x/y?utm_medium=m&a=1&b=2")
    assert(canon(variants: _*).distinct === Seq("https://cdn.site.io/x/y?a=1&b=2"))
  }

  test("canonicalUrl: query-less and root-path URLs degrade gracefully") {
    assert(canon("https://a.com/", "https://a.com", "https://a.com/p/") ===
      Seq("https://a.com", "https://a.com", "https://a.com/p"))
  }
}
