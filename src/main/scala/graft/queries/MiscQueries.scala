package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.streaming.StreamingPipeline

/** Driver-contract queries for the multimodal plumbing and the
  * Structured-Streaming twin. The streaming queries REALLY run through
  * the streaming engine (file source → stateful agg → AvailableNow →
  * memory sink); the oracle re-derives their results relationally.
  */
object MiscQueries {

  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.attachPayload(
      Tables.distributed(spark, sfDir, "documents"), "doc_id", "text")
    Multimodal.decodeFeatures(media).toDF()
  }

  def streamingSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val events = StreamingPipeline.readEvents(spark, sfDir)
    StreamingPipeline.runToMemory(
      StreamingPipeline.sessionAgg(events), "graft_stream_sessions")
      .select("user_id", "session_start", "session_end", "n_events")
  }

  def streamingHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val events = StreamingPipeline.readEvents(spark, sfDir)
    StreamingPipeline.runToMemory(
      StreamingPipeline.hourlyAgg(events), "graft_stream_hourly")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> multimodalFeatures,
    "streaming_sessions" -> streamingSessions,
    "streaming_hourly" -> streamingHourly
  )

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
        |  md5(text) AS checksum,
        |  CAST((octet_length(text::BLOB) + 255) // 256 AS BIGINT) AS n_chunks,
        |  CAST((octet_length(text::BLOB) + 63) // 64 AS BIGINT) AS sampled_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type
        |FROM documents""".stripMargin,
    "streaming_sessions" ->
      """WITH d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sn FROM d)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sn""".stripMargin,
    "streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
