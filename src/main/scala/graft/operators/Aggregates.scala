package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report-level aggregations over the enriched log frame
  * (reference elb_logs.py:351-394). Each is a single hash-aggregate:
  * partial (map-side) aggregation comes free from groupBy, so the
  * shuffle carries one row per (group × partition), not per event —
  * the property that makes these run at 100 TB.
  */
object Aggregates {

  /** pandas `groupby(dropna=True)` — the reference's default — silently
    * drops rows whose group KEY is null, while Spark keeps a null-keyed
    * group. The live HTTP provider can return null countryName/city
    * (missing API fields), so grouped reports filter null keys first to
    * match the reference's output surface. Provider FAILURES are not
    * affected — they carry the non-null 'Error' sentinel and group as
    * such on both engines.
    */
  private def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNotNull).reduce(_ && _))

  /** Hourly geo traffic rollup (reference `export_hourly_aggregates`,
    * elb_logs.py:351-368): 6 group keys, 9 aggregates. `median` is
    * Spark's exact median — `percentile_approx` would diverge from the
    * pandas/DuckDB exact result (SURVEY.md §7.4 trap 2). pandas `count`
    * on client_ip equals count(*) post-filter (nulls already dropped);
    * `nunique` maps to countDistinct. Null group keys drop (pandas
    * dropna; see [[dropNullKeys]]).
    */
  def hourlyAggregates(df: DataFrame): DataFrame =
    dropNullKeys(df, Seq("countryName", "city")).groupBy(
        col("request_year"), col("request_month"), col("request_day"),
        col("request_hour"), col("countryName"), col("city"))
      .agg(
        count(col("client_ip")).as("request_count"),
        countDistinct(col("client_ip")).as("unique_client_ips_count"),
        avg(col("total_processing_time")).as("average_total_processing_time"),
        median(col("total_processing_time")).as("median_total_processing_time"),
        // pandas sum() has min_count=0: an all-NaN group sums to 0, not
        // null (proven against the reference by tools/ref_diff.py)
        coalesce(sum(col("sent_bytes")), lit(0L)).as("sum_sent_bytes"),
        coalesce(sum(col("received_bytes")), lit(0L)).as("sum_received_bytes"),
        count_if(col("status_code_type") === "2xx_Success").as("count_2xx"),
        count_if(col("status_code_type") === "4xx_ClientError").as("count_4xx"),
        count_if(col("status_code_type") === "5xx_ServerError").as("count_5xx"))

  /** Error rows + report projection (reference `export_error_summary`,
    * elb_logs.py:370-378).
    */
  def errorSummary(df: DataFrame): DataFrame =
    df.filter(col("status_code_type").isin("4xx_ClientError", "5xx_ServerError"))
      .select("time", "client_ip", "city", "countryName", "isp",
        "http_method", "full_url", "elb_status_code",
        "target_status_code_list", "user_agent",
        "ua_browser_family", "ua_os_family", "error_reason")

  /** Bot rows, detail projection (reference `export_bot_traffic`,
    * elb_logs.py:380-394).
    */
  def botDetails(df: DataFrame): DataFrame =
    df.filter(col("is_bot"))
      .select("time", "client_ip", "city", "countryName", "isp",
        "full_url", "user_agent")

  /** Bot origin rollup: groupby().size() is count(*), not count(col) —
    * rows with nulls in non-key columns still count (SURVEY.md §2
    * op 34) — but null group KEYS drop (pandas dropna;
    * see [[dropNullKeys]]).
    */
  def botOriginSummary(df: DataFrame): DataFrame =
    dropNullKeys(df.filter(col("is_bot")), Seq("countryName", "isp"))
      .groupBy("countryName", "isp")
      .agg(count(lit(1)).as("bot_request_count"))
}
