package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Journey

/** User-journey surface over `events`: multi-touch attribution and
  * Markov transition estimation (operators in [[graft.operators.Journey]]).
  */
object JourneyQueries {

  /** Purchase conversions attributed to view/click touches. */
  def attributionTouch(spark: SparkSession, sfDir: String): DataFrame =
    Journey.attribution(Tables.events(spark, sfDir),
      userCol = "user_id", tsCol = "ts", idCol = "event_id",
      typeCol = "event_type", valueCol = "value",
      convType = "purchase", touchTypes = Seq("view", "click"))

  /** Row-stochastic event-type transition matrix. */
  def markovTransitions(spark: SparkSession, sfDir: String): DataFrame =
    Journey.markovTransitions(Tables.events(spark, sfDir),
      userCol = "user_id", tsCol = "ts", idCol = "event_id",
      typeCol = "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution_touch" -> attributionTouch,
    "markov_transitions" -> markovTransitions
  )

  val oracle: Map[String, String] = Map(
    "attribution_touch" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM events
        |), seg AS (
        |  SELECT *,
        |    CASE WHEN event_type = 'purchase' THEN cum ELSE cum + 1 END AS seg,
        |    CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END AS is_touch
        |  FROM ev
        |), ag AS (
        |  SELECT *,
        |    sum(is_touch) OVER (PARTITION BY user_id, seg) AS n,
        |    sum(is_touch) OVER (PARTITION BY user_id, seg ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS idx,
        |    max(CASE WHEN event_type = 'purchase' THEN value END)
        |      OVER (PARTITION BY user_id, seg) AS conv_value
        |  FROM seg
        |)
        |SELECT event_type AS channel,
        |  CAST(count(*) AS BIGINT) AS touches,
        |  round(sum(CAST(1 AS DOUBLE) / n), 6) AS conv_linear,
        |  round(sum(CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
        |                 WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
        |                 WHEN idx = 1 OR idx = n THEN CAST(0.4 AS DOUBLE)
        |                 ELSE CAST(0.2 AS DOUBLE) / (n - 2) END), 6) AS conv_ushape,
        |  CAST(sum(CASE WHEN idx = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_first,
        |  CAST(sum(CASE WHEN idx = n THEN 1 ELSE 0 END) AS BIGINT) AS conv_last,
        |  round(sum(conv_value * (CAST(1 AS DOUBLE) / n)), 3) AS rev_linear
        |FROM ag
        |WHERE is_touch = 1 AND conv_value IS NOT NULL
        |GROUP BY 1""".stripMargin,
    "markov_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM events
        |)
        |SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY src) AS p
        |FROM s WHERE dst IS NOT NULL
        |GROUP BY src, dst""".stripMargin
  )
}
