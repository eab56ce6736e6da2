package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Language-ID marker-table coverage: the driver corpus is English
  * lorem, so the extended languages are exercised here with native
  * sample sentences (built from the marker vocabularies plus filler —
  * the heuristic's operating regime: function words dominate).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId classifies sample text in every marker-table language") {
    val samples = Seq(
      "en" -> "the cat sat on the mat and it is clear that the dog is in the garden",
      "es" -> "el perro y la casa de los vecinos que viven en una calle de las flores",
      "de" -> "der hund und die katze das ist nicht ein problem und der garten ist schön",
      "fr" -> "le chien et les chats dans une maison pour le village est grande",
      "pt" -> "o gato e os cães dos vizinhos não são como uma casa das flores",
      "it" -> "il cane e gli amici che sono con la famiglia per della città",
      "nl" -> "het huis is niet aan de straat maar ook een tuin en zijn bomen",
      "pl" -> "się okazuje że jest to nie która przez oraz tym razem działa",
      "ru" -> "chto eto takoe kak tak vot ili net nikto ne znaet chto delat",
      "zh" -> "今天天气很好我们去公园散步然后回家吃饭",
      "ja" -> "きょうは いい てんき です こうえん に いきましょう")
    val got = samples.map(_._2).toDF("text")
      .select(TextAnalysis.langId(col("text")))
      .collect().map(_.getString(0))
    samples.map(_._1).zip(got).foreach { case (want, g) =>
      assert(g === want, s"expected $want")
    }
  }

  test("BpeSegmentCount equals the regexp formulation on adversarial " +
      "and random unicode inputs") {
    val rnd = new scala.util.Random(99)
    val alphabet = "ab A1 ##.éл語 \n\t-_ zz9"
    val hand = Seq("", " ", "   ", "a", " a", "a  b", "ab12#x", "##ab",
      "héllo wörld", "a#a", "1.5e-3", "... - •", "日本語 text",
      "trailing space ", " leading", "tab\tsep", "nl\nsep")
    val random = (1 to 200).map(_ =>
      (1 to rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val df = (hand ++ random).toDF("text").select(
      col("text"),
      TextAnalysis.bpeTokenCount(col("text")).as("fast"),
      graft.operators.TextAnalysis.bpeTokenCountRegexp(col("text")).as("slow"))
    val bad = df.where(col("fast") =!= col("slow"))
      .as[(String, Int, Int)].collect()
    assert(bad.isEmpty, s"diverged on: ${bad.take(5).toSeq}")
  }

  test("MarkerCounts equals the regexp formulation per language on " +
      "adversarial and random inputs") {
    val rnd = new scala.util.Random(123)
    val vocab = Seq("the", "and", "el", "der", "não", "się", "chto",
      "xthe", "thex", "The", "AND", "a", "##", "一二三", "ひらがな",
      "カタカナ", "mixed一ひ", "", " ", "  ")
    val hand = Seq(
      "the the the", "the  the", " the", "the ", " the ", "x the x",
      "el la los las", "der und die das", "não são", "się nie",
      "一二三 the 四五", "ひらがな と カタカナ", "chto eto kak",
      "the,and the.and", "THE AND OF")
    val random = (1 to 150).map(_ =>
      (0 to rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    val langs = graft.operators.TextAnalysis.markers.map(_._1)
    val df = (hand ++ random).toDF("text").select(
      col("text") +:
        langs.flatMap(l => Seq(
          TextAnalysis.markerCount(col("text"), l).as(s"f_$l"),
          graft.operators.TextAnalysis.markerCountRegexp(col("text"), l)
            .as(s"s_$l"))): _*)
    langs.foreach { l =>
      val bad = df.where(col(s"f_$l") =!= col(s"s_$l"))
        .select("text", s"f_$l", s"s_$l")
        .as[(String, Int, Int)].collect()
      assert(bad.isEmpty, s"lang $l diverged on: ${bad.take(5).toSeq}")
    }
  }

  test("TextScanStats equals the four regexp formulations on " +
      "adversarial whitespace/unicode inputs") {
    val rnd = new scala.util.Random(321)
    val alphabet = "ab 9# \t\né語\r\n  -"
    val hand = Seq("", " ", "  ", "\t", " \t", "\ta", "a\t", "a  b",
      "  a  ", "\t\n", "ab", "é語#9", "x.y,z", " .", ". ",
      "tab\tand space", "end\n")
    val random = (1 to 200).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val T = graft.operators.TextAnalysis
    val df = (hand ++ random).toDF("text").select(col("text"),
      T.punctRatio(col("text")).as("p1"), T.punctRatioRegexp(col("text")).as("p2"),
      T.digitRatio(col("text")).as("d1"), T.digitRatioRegexp(col("text")).as("d2"),
      T.avgWordLen(col("text")).as("a1"), T.avgWordLenRegexp(col("text")).as("a2"),
      T.wordCount(col("text")).as("w1"), T.wordCountRegexp(col("text")).as("w2"))
    val bad = df.where(col("p1") =!= col("p2") || col("d1") =!= col("d2") ||
        col("a1") =!= col("a2") || col("w1") =!= col("w2"))
      .collect()
    assert(bad.isEmpty, s"diverged on: ${bad.take(5).toSeq}")
  }

  test("gopher filters: each rule fires on its designed violation") {
    import graft.operators.Hygiene
    // a passing document: 60 plain words incl. >=2 stop words
    val good = (("the quick brown fox and the lazy dog went to of that " +
      "have with ") * 6).trim
    val cases = Seq(
      (1L, good, true, "clean"),
      (2L, "short text", false, "under 50 words"),
      (3L, good.replace(" ", " ### "), false, "symbol ratio"),
      (4L, good.split(" ").map(w => s"- $w").mkString("\n"), false, "bullets"),
      (5L, good.split(" ").map(w => s"$w...").mkString("\n"), false, "ellipsis lines"),
      (6L, (1 to 60).map(_.toString).mkString(" ") + " the of", false, "alpha fraction"),
      (7L, ("zzz " * 60).trim, false, "no stop words"))
    val out = cases.map(c => (c._1, c._2)).toDF("doc_id", "text")
      .select(col("doc_id") +: Hygiene.gopherColumns(col("text")): _*)
      .withColumn("gopher_keep", Hygiene.gopherKeep)
      .select("doc_id", "gopher_keep").as[(Long, Boolean)].collect().toMap
    cases.foreach { case (id, _, keep, why) =>
      assert(out(id) == keep, s"case '$why' (doc $id): got ${out(id)}")
    }
  }

  test("langId ties break to the earlier table row; no markers means und") {
    val und = Seq("xyzzy plugh 12345").toDF("text")
      .select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(und === "und")
    // 'le' is fr, 'el' is es: one marker each → tie broken to es (earlier row)
    val tie = Seq("el foo le bar").toDF("text")
      .select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(tie === "es")
  }

  test("bigram LM score: rare vs common bigrams on a hand-counted corpus") {
    import spark.implicits._
    // "a b" occurs 3x corpus-wide (docs 1,2,3); every other bigram once
    val docs = Seq(
      (1L, "a b c"),       // bigrams: "a b"(3), "b c"(1)
      (2L, "a b d"),       // "a b"(3), "b d"(1)
      (3L, "x a b"),       // "x a"(1), "a b"(3)
      (4L, "solo")         // < 2 words: no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text", rareMax = 2L)
      .select("doc_id", "n_bigrams", "sum_freq", "n_rare", "rare_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 2L, 4L, 1L, 0.5),   // sum_freq = 3 + 1
      (2L, 2L, 4L, 1L, 0.5),
      (3L, 2L, 4L, 1L, 0.5),
      (4L, 0L, 0L, 0L, 0.0)))
  }

  test("kana presence separates ja from zh even with shared ideographs") {
    // Japanese prose mixes kanji with kana; the kana count dominates
    val ja = Seq("日本語のテキストはひらがなとカタカナを含みます").toDF("text")
      .select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(ja === "ja")
    val zh = Seq("中文文本只包含汉字没有假名").toDF("text")
      .select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(zh === "zh")
  }

  test("linearQualityFilter == an expression-built reference; sign gate; gram count") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "x"),
      (3L, "alpha alpha alpha"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.linearQualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // reference path: builtin md5/conv expressions (the oracle idiom),
    // fully independent of the HashedGramScore kernel internals
    val uni = explode(split(col("text"), " "))
    val big = explode(expr(
      """CASE WHEN size(split(text, ' ')) >= 2 THEN
        |  transform(sequence(1, size(split(text, ' ')) - 1),
        |    i -> concat_ws(' ', element_at(split(text, ' '), i),
        |                        element_at(split(text, ' '), i + 1)))
        |ELSE array() END""".stripMargin))
    val grams = docs.select(col("doc_id"), uni.as("g"))
      .unionByName(docs.select(col("doc_id"), big.as("g")))
    val bucket = pmod(conv(substring(md5(col("g")), 1, 15), 16, 10)
      .cast("long"), lit(65536L))
    val weight = pmod(conv(substring(md5(concat(lit("qw:"),
      bucket.cast("string"))), 1, 15), 16, 10).cast("long"), lit(2001L)) - 1000L
    val ref = grams.select(col("doc_id"), weight.as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("w").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((id, (n, s)) <- ref) {
      assert(out(id)._1 === n, s"n_grams of doc $id")
      assert(out(id)._2 === s, s"score_sum of doc $id")
      assert(out(id)._3 === (if (s >= 0) 1 else 0), s"keep gate of doc $id")
    }
    // structural pin: k tokens -> k unigrams + (k-1) bigrams
    assert(out(1L)._1 === 7L)
    assert(out(2L)._1 === 1L)
    assert(out(4L)._1 === 17L)
  }
}
