package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-contract queries over the `events` table.
  *
  * These exercise the engine's aggregate/window surface on generic data
  * (FIXTURES.md §3 maps `user_id` ≈ client_ip, `ts` ≈ time). Each query
  * has a DuckDB-oracle twin in [[oracle]]; column names must match the
  * Spark output exactly (the driver sorts columns by name before hashing).
  *
  * Float determinism: `value` carries exactly 2 decimals, so
  * `round(sum(value), 3)` is exact in both engines regardless of
  * summation order; averages are derived from that rounded sum with
  * identical arithmetic on both sides.
  */
object EventQueries {

  /** Hourly traffic aggregate — Spark mapping of the reference's flagship
    * `export_hourly_aggregates` (reference elb_logs.py:351-368): 6-key
    * groupBy with count / countDistinct / mean / exact median / sums /
    * conditional counts. Single hash-aggregate shuffle on the group keys;
    * partial aggregation (map-side combine) comes free from groupBy.
    */
  def hourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(
        year(col("ts")).as("request_year"),
        month(col("ts")).as("request_month"),
        dayofmonth(col("ts")).as("request_day"),
        hour(col("ts")).as("request_hour"),
        col("event_type"))
      .agg(
        count(col("user_id")).as("request_count"),
        countDistinct(col("user_id")).as("unique_users_count"),
        round(sum(col("value")), 3).as("sum_value"),
        round(median(col("value")), 3).as("median_value"),
        count_if(col("value") > 100).as("count_hi"),
        count_if(col("value") <= 100 && col("value") > 10).as("count_mid"),
        count_if(col("value") <= 10).as("count_lo"))
      .withColumn("avg_value", col("sum_value") / col("request_count"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hourly_agg" -> hourlyAgg
  )

  val oracle: Map[String, String] = Map(
    "hourly_agg" ->
      """SELECT year(ts) AS request_year, month(ts) AS request_month,
        |  day(ts) AS request_day, hour(ts) AS request_hour, event_type,
        |  count(user_id) AS request_count,
        |  count(DISTINCT user_id) AS unique_users_count,
        |  round(sum(value), 3) AS sum_value,
        |  round(median(value), 3) AS median_value,
        |  count(*) FILTER (value > 100) AS count_hi,
        |  count(*) FILTER (value <= 100 AND value > 10) AS count_mid,
        |  count(*) FILTER (value <= 10) AS count_lo,
        |  round(sum(value), 3) / count(user_id) AS avg_value
        |FROM events
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin
  )
}
