package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{TextAnalysis => T}

/** Driver-contract queries for the text-analysis family over
  * `documents`. DuckDB note: its regexp_replace needs the 'g' flag to
  * match Spark's always-global replacement.
  */
object TextQueries {

  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.distributed(spark, sfDir, "documents").select(
      col("doc_id"),
      T.wordCount(col("text")).as("n_words"),
      T.bpeTokenCount(col("text")).as("bpe_tokens"),
      length(col("text")).as("n_chars_measured"),
      T.avgWordLen(col("text")).as("avg_word_len"),
      T.punctRatio(col("text")).as("punct_ratio"),
      T.digitRatio(col("text")).as("digit_ratio"))

  def textLangid(spark: SparkSession, sfDir: String): DataFrame =
    Tables.distributed(spark, sfDir, "documents").select(
      col("doc_id"),
      T.langId(col("text")).as("lang_pred"),
      T.markerCount(col("text"), "en").as("en_hits"),
      T.markerCount(col("text"), "es").as("es_hits"),
      T.markerCount(col("text"), "de").as("de_hits"),
      T.markerCount(col("text"), "fr").as("fr_hits"))

  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.distributed(spark, sfDir, "documents").select(
      col("doc_id"),
      T.stopwordRatio(col("text")).as("stopword_ratio"),
      T.qualityScore(col("text")).as("quality_score"))

  // winnowMin (array-HOF) measured FASTER here than the exploded-join
  // form: one narrow pass beats an explode + aggregate + join shuffle
  // when every doc needs exactly one output row.
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.distributed(spark, sfDir, "documents").select(
      col("doc_id"),
      T.fingerprint(col("text")).as("fingerprint"),
      T.winnowMin(col("text")).as("winnow_min"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> textStats,
    "text_langid" -> textLangid,
    "text_quality" -> textQuality,
    "text_fingerprint" -> textFingerprint
  )

  // -- oracle SQL ------------------------------------------------------

  private def hits(lang: String): String = {
    val pat = T.markers.toMap.apply(lang)
    s"len(regexp_extract_all(lower(text), '$pat'))"
  }

  private val nWords = """len(string_split_regex(trim(text), '\s+'))"""
  private val punct =
    """len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))::DOUBLE / greatest(length(text), 1)"""
  private val digit =
    """len(regexp_extract_all(text, '[0-9]'))::DOUBLE / greatest(length(text), 1)"""
  private val awl =
    s"""length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / greatest($nWords, 1)"""
  private val stopRatio =
    s"""(${hits("en")} + ${hits("es")} + ${hits("de")} + ${hits("fr")})::DOUBLE
       | / greatest($nWords, 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id,
         |  $nWords AS n_words,
         |  len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS bpe_tokens,
         |  length(text) AS n_chars_measured,
         |  $awl AS avg_word_len,
         |  $punct AS punct_ratio,
         |  $digit AS digit_ratio
         |FROM documents""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${hits("en")} + ${hits("es")} + ${hits("de")} + ${hits("fr")} = 0 THEN 'und'
         |    WHEN ${hits("en")} >= ${hits("es")} AND ${hits("en")} >= ${hits("de")}
         |      AND ${hits("en")} >= ${hits("fr")} THEN 'en'
         |    WHEN ${hits("es")} >= ${hits("de")} AND ${hits("es")} >= ${hits("fr")} THEN 'es'
         |    WHEN ${hits("de")} >= ${hits("fr")} THEN 'de'
         |    ELSE 'fr' END AS lang_pred,
         |  ${hits("en")} AS en_hits, ${hits("es")} AS es_hits,
         |  ${hits("de")} AS de_hits, ${hits("fr")} AS fr_hits
         |FROM documents""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  $stopRatio AS stopword_ratio,
         |  least($stopRatio, 0.5) * 0.8
         |    + CASE WHEN $awl >= 3 AND $awl <= 10 THEN 0.3 ELSE 0.0 END
         |    + CASE WHEN $nWords >= 20 THEN 0.3 ELSE 0.1 END
         |    - ($punct) * 0.5 - ($digit) * 0.5 AS quality_score
         |FROM documents""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
         |    '\\s+', ' ', 'g'))) AS fingerprint,
         |  list_min(list_transform(list_distinct(list_transform(
         |    generate_series(1, len(words) - 4),
         |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
         |         || words[i+3] || ' ' || words[i+4])), sh -> md5(sh))) AS winnow_min
         |FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)""".stripMargin
  )
}
