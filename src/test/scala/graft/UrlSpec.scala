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

  test("kernel matches the builtin-column twin on adversarial inputs") {
    // every substring_index / split / sort edge the kernel re-implements:
    // missing scheme, double ://, multi-colon authority, ?? and ##,
    // empty/utm-only/duplicated params, trailing & and leading &,
    // unicode case, CJK path, all-slash path, empty string
    val urls = Seq(
      "no-scheme-at-all",
      "", "#", "?", "://", "a://b://c/d?x=1",
      "https://h:1:2/p",                    // port = after LAST ':'
      "https://h/p??a=1&b=2",               // rawQ = after LAST '?'
      "https://h/p?a=1#f1#f2",              // frag = after FIRST '#'
      "https://h/p?&&a=1&",                 // empty params dropped
      "https://h/p?utm_a=1&utm_b=2",        // all dropped -> no '?'
      "https://h/p?z=1&z=1&a=2",            // duplicates kept, sorted
      "HTTPS://ÄÖÜ.example/Straße/?x=1",    // unicode lowercase
      "http://例え.jp/パス/?b=2&a=1",
      "https://h/////",
      "http://h:80/p?a", "https://h:443/p?a", "http://h:443/p",
      "ftp://H:21/Dir/")
    val df = urls.toDF("url")
    val both = df.select(
      Urls.canonicalUrl(col("url")).as("k"),
      Urls.canonicalUrlColumns(col("url")).as("c")).collect()
    both.zip(urls).foreach { case (r, u) =>
      assert(r.getString(0) === r.getString(1), s"input: $u")
    }
  }
}
