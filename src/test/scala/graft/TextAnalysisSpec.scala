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
}
