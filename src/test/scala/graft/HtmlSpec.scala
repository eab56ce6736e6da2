package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Html

/** html_extract: the kernel must reproduce the regexp/replace chain
  * (the oracle's definition) bit-for-bit — on hand-written hostile
  * markup, on the synthesized fixture corpus, and the boilerplate
  * rules must actually drop boilerplate.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def rows(d: DataFrame) =
    d.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def pinEqual(html: Seq[String], minWords: Int = 1): Unit = {
    val df = html.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    assert(rows(Html.extractMainText(df, "id", "html", minWords)) ===
      rows(Html.extractMainTextColumns(df, "id", "html", minWords)))
  }

  test("kernel equals the column chain on hostile markup") {
    pinEqual(Seq(
      // nested anchors: inner opener counts as link content
      "<p><a href='x'>one <a y>two</a> three</a></p>",
      // unclosed script: open tag stripped as a plain tag, body leaks
      "<script>var x<p>hello world this line</p>",
      // newline between script open and close: .*? cannot cross it
      "<script>a\n</script><p>w1 w2 w3</p>",
      "<script>a </script><p>w1 w2 w3</p>",
      // stray markers already in the text participate in the state machine
      "<p>weird \u0001 and \u0002 chars here</p>",
      "<p>tail link <a href=z>never closed",
      // double-decode guard: &amp;lt; must come out as literal &lt;
      "<p>a &amp;lt; b &lt; c&nbsp;d</p>",
      "<p>begin <div attr unclosed",
      "one two three<br>four five six<br/>seven eight nine",
      "<h1>t</h1><h3>sub head</h3><h7>not a break</h7><p>real words here</p>",
      "", "plain text with no markup at all",
      "tabs\there c d  e   f",
      "emoji 😀 test words <a href=q>😀😀</a> more",
      "<style>p { color: red }</style>styled words here",
      "<p></p><p> </p><p>x</p>trailing<br>"))
  }

  test("kernel equals the chain on the fixture corpus") {
    val corpus = graft.queries.TextQueries
      .htmlCorpus(spark, "/root/testdata/sf0.001").limit(200)
    assert(rows(Html.extractMainText(corpus, "doc_id", "html")) ===
      rows(Html.extractMainTextColumns(corpus, "doc_id", "html")))
  }

  test("boilerplate drops and prose survives with exact stats") {
    val html =
      "<html><body>" +
        "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/x\">More</a> <a href=\"/y\">Links</a></div>" +
        "<h1>Two words</h1>" +
        "<p>This is a real sentence with enough words.</p>" +
        "<p>See the <a href=\"/ref\">reference page</a> for details and context.</p>" +
        "<div><a href=\"/p\">prev</a> <a href=\"/n\">next</a></div>" +
        "</body></html>"
    val got = Html.extractMainText(
      Seq((1L, html)).toDF("id", "html"), "id", "html")
      .select("line_no", "content", "n_words", "n_chars", "link_chars")
      .as[(Int, String, Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      // nav (line 1: all links), h1 (2 words), footer (all links) drop
      (3, "This is a real sentence with enough words.", 8, 42L, 0L),
      (4, "See the reference page for details and context.", 8, 47L, 14L)))
  }
}
