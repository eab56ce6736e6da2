package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the one standard crawl-pipeline
  * stage upstream of `text_quality` that had no twin here (VERDICT r15
  * "What's missing" #3): strip script/style with their bodies, mark
  * anchor spans, break block tags into lines, strip remaining tags,
  * decode the six common entities, then keep the lines that look like
  * prose — ≥ `minWords` words and link density ≤ ½ (2·link_chars ≤
  * raw_chars), the jusText/trafilatura boilerplate rule in its
  * simplest exact-integer form (no float density).
  *
  * Rule table and regex semantics live in
  * [[graft.functions.HtmlExtractLines]] (the hot-path kernel);
  * [[extractColumns]] is the builtin regexp/replace chain the DuckDB
  * oracle replays verbatim, kept as the spec twin — HtmlSpec pins
  * kernel ≡ chain on the corpus and on hostile markup.
  *
  * Scale shape: a narrow 1:many projection (flatMap) with NO shuffle —
  * at 100 TB the crawl scan is the cost and this adds one string pass
  * per document.
  */
object Html {

  /** Kept-line extraction over `htmlCol` — kernel path. */
  def extractMainText(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 3): DataFrame =
    keepRule(
      df.select(col(idCol),
        inline(graft.functions.HtmlExtractLines
          .html_extract_lines(col(htmlCol)))),
      minWords)

  /** The identical extraction as the builtin column chain (regexp
    * stack — spec twin and oracle documentation; NOT the hot path).
    */
  def extractMainTextColumns(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 3): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(extractColumns(col(htmlCol)), "\n", -1))
        .as(Seq("_p", "_line")))
    val noMark = regexp_replace(
      regexp_replace(col("_line"), "\u0001", ""), "\u0002", "")
    val content = trim(regexp_replace(noMark, " +", " "))
    // paired x01..x02 segments plus the unpaired tail, content
    // codepoints only (the kernel's state-machine rule)
    val paired = aggregate(
      transform(regexp_extract_all(col("_line"), lit("\u0001[^\u0002]*\u0002"), lit(0)),
        x => (length(x) - 2).cast("long")),
      lit(0L), (a, x) => a + x)
    val tail0 = regexp_extract(col("_line"), "\u0001[^\u0002]*$", 0)
    val linkChars = paired +
      when(tail0 =!= "", (length(tail0) - 1).cast("long")).otherwise(lit(0L))
    keepRule(
      lines.select(col(idCol),
        (col("_p") + 1).cast("int").as("line_no"),
        content.as("content"),
        when(content === "", lit(0))
          .otherwise(size(split(content, " "))).cast("int").as("n_words"),
        length(content).cast("long").as("n_chars"),
        linkChars.cast("long").as("link_chars"),
        length(noMark).cast("long").as("raw_chars")),
      minWords)
  }

  private def keepRule(lines: DataFrame, minWords: Int): DataFrame =
    lines
      .where(col("n_words") >= minWords &&
        col("link_chars") * 2 <= col("raw_chars"))
      .drop("raw_chars")

  /** The whole pre-split transform chain as builtin expressions — the
    * definition the oracle replays step for step.
    */
  def extractColumns(html: Column): Column = {
    val h1 = regexp_replace(html, "<script[^>]*>.*?</script>", " ")
    val h2 = regexp_replace(h1, "<style[^>]*>.*?</style>", " ")
    val h3 = regexp_replace(h2, "<a [^>]*>", "\u0001")
    val h4 = regexp_replace(h3, "</a>", "\u0002")
    val h5 = regexp_replace(h4, "</p>|</div>|</li>|</h[1-6]>|<br>|<br/>", "\n")
    val h6 = regexp_replace(h5, "<[^>]*>", "")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(h6) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
  }
}
