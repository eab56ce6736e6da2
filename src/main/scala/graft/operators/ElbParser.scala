package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ElbSchema
import graft.functions.{ElbColumns => F, Ua}

/** The reference's per-record parse path (`parse_log_line`,
  * reference elb_logs.py:74-132) re-expressed as one declarative
  * column-expression pipeline: tokenize → arity check → schema zip →
  * timestamp parse → numeric coercion → IP extract → request/URL
  * decompose → UA classify + bot flag → lineage.
  *
  * Malformed rows are dropped, never thrown (PERMISSIVE semantics):
  * short lines, unparseable `time`, or a non-sentinel unparseable float
  * all eliminate the row — the exact failure surface of the reference's
  * try/except → None.
  *
  * Everything is builtin Catalyst expressions, so the whole parse is one
  * WholeStageCodegen span over the text scan: no shuffle, no UDF, scales
  * linearly with input splits.
  */
object ElbParser {

  /** Observation names for [[parse]]'s malformed-row drop counters. */
  val DropsArity = "elb_parse_drops_arity"
  val DropsTime = "elb_parse_drops_time"
  val DropsFloat = "elb_parse_drops_float"

  /** Collect the drop counts observed by [[parse]] from an executed
    * query: short/long lines, unparseable strict timestamps, and
    * non-sentinel unparseable floats.
    *
    * Call with the EXACT DataFrame an action ran on (collect / write /
    * foreach fill that dataset's own observed metrics). `df.count()`
    * does NOT qualify — it executes a separate aggregate plan, leaving
    * this dataset's metric accumulators at zero. Any frame DERIVED from
    * a parse output works too: the CollectMetrics nodes ride along in
    * its plan.
    */
  def dropCounts(df: DataFrame): Map[String, Long] = {
    val m = df.queryExecution.observedMetrics
    Seq(DropsArity -> "dropped_arity", DropsTime -> "dropped_time",
      DropsFloat -> "dropped_float").flatMap { case (name, field) =>
      m.get(name).map(row => name -> row.getAs[Long](field))
    }.toMap
  }

  /** Parse a DataFrame of raw log lines.
    *
    * @param lines must contain `lineCol` (string); if a
    *              `log_source_file` column is present it is carried
    *              through (reference elb_logs.py:128).
    * @param observed attach the drop-count metrics (default). Pass
    *                 false for AUXILIARY parse passes that may appear
    *                 in the same query as the main one through a
    *                 different plan instance — Spark rejects duplicate
    *                 metric names unless the subtrees are identical.
    */
  def parse(lines: DataFrame, lineCol: String = "value",
      observed: Boolean = true): DataFrame = {
    val hasSource = lines.columns.contains("log_source_file")
    val withSource =
      if (hasSource) lines
      else lines.withColumn("log_source_file", input_file_name())

    // One-pass tokenize + unquote + arity check via the compact codegen
    // expression (see ElbParseFields for why the builtin formulations
    // fell out of whole-stage codegen); null fields array = short line,
    // dropped here (reference elb_logs.py:77-78).
    //
    // Each drop point is observed (CollectMetrics): the reference warns
    // per dropped line (elb_logs.py:130-132); per-line logging is not a
    // thing a distributed engine should do, so we surface the same
    // information as per-batch drop COUNTS, readable after any action
    // via queryExecution.observedMetrics (see [[dropCounts]]).
    def obs(df: DataFrame, name: String, metric: org.apache.spark.sql.Column): DataFrame =
      if (observed) df.observe(name, metric) else df

    val toks = obs(
      withSource.withColumn("_fields",
        graft.functions.ElbParseFields.elb_parse_fields(col(lineCol))),
      DropsArity, count(when(col("_fields").isNull, 1)).as("dropped_arity"))
      .filter(col("_fields").isNotNull)

    // Zip the fields onto the declared schema (reference elb_logs.py:80).
    val raw = toks.select(
      col("log_source_file") +:
        ElbSchema.columns.zipWithIndex.map { case (name, i) =>
          get(col("_fields"), lit(i)).as(name)
        }: _*)

    val floatOk = ElbSchema.floatColumns
      .map(c => F.floatRowOk(col(c)))
      .reduce(_ && _)

    val parsedTime = obs(
      obs(raw.withColumn("time", F.parseElbTime(col("time"))),
        DropsTime, count(when(col("time").isNull, 1)).as("dropped_time"))
        .filter(col("time").isNotNull),        // strict strptime → row drop
      DropsFloat, count(when(!floatOk, 1)).as("dropped_float"))
      .filter(floatOk)                          // float() raise → row drop
      .withColumn("request_creation_time", F.parseLenientTime(col("request_creation_time")))

    val coerced = parsedTime
      .withColumns(ElbSchema.floatColumns.map(c => c -> F.coerceFloat(col(c))).toMap)
      .withColumns(ElbSchema.intColumns.map(c => c -> F.coerceInt(col(c))).toMap)
      .withColumn("client_ip", F.clientIp(col("client_ip_port")))

    // Request decomposition (reference elb_logs.py:103-116): the quoted
    // request must split into exactly method/url/version, else every
    // derived field stays null (the reference's bare `except: pass`).
    val parts = split(col("request"), " ")
    val valid = size(parts) === 3
    def ifValid(c: Column): Column = when(valid, c)

    val url = get(parts, lit(1))
    // urlparse semantics beyond what parse_url covers (proven by the
    // tools/ref_diff.py differential gate): a URL with no `scheme://`
    // authority — e.g. the literal `-` ELB logs when a connection closes
    // before the request completes — still decomposes; everything after
    // an opaque `scheme:` prefix (or the whole string) becomes the path,
    // with `?query`/`#fragment` split off. urlparse also lowercases the
    // scheme; parse_url preserves its case.
    val hasAuthority = url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val afterScheme = when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"),
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*:(.*)$", 1))
      .otherwise(url)
    val noFragment = substring_index(afterScheme, "#", 1)
    val decomposed = coerced
      .withColumn("http_method", ifValid(get(parts, lit(0))))
      .withColumn("full_url", ifValid(url))
      .withColumn("http_version", ifValid(get(parts, lit(2))))
      .withColumn("protocol", ifValid(lower(when(hasAuthority,
        coalesce(parse_url(url, lit("PROTOCOL")), lit("")))
        .otherwise(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)))))
      .withColumn("hostname", ifValid(lower(parse_url(url, lit("HOST")))))
      .withColumn("port", ifValid(F.urlPort(url)))
      .withColumn("path", ifValid(when(hasAuthority,
        coalesce(parse_url(url, lit("PATH")), lit("")))
        .otherwise(substring_index(noFragment, "?", 1))))
      .withColumn("query_params", ifValid(when(hasAuthority,
        coalesce(parse_url(url, lit("QUERY")), lit("")))
        .otherwise(regexp_extract(noFragment, "\\?(.*)$", 1))))

    decomposed
      .withColumn("ua_browser_family", Ua.browserFamily(col("user_agent")))
      .withColumn("ua_os_family", Ua.osFamily(col("user_agent")))
      .withColumn("is_bot", Ua.isBot(col("user_agent")))
  }

  /** Not-null + health-check filters, status bucketing, WAF flag
    * (reference `filter_categorize_df`, elb_logs.py:241-257). Kept
    * separate from [[parse]] so Catalyst can push these predicates below
    * the enrichment join, which the reference runs first (SURVEY.md §4).
    */
  def filterCategorize(df: DataFrame): DataFrame =
    df.filter(col("client_ip").isNotNull && col("request").isNotNull)
      .filter(Ua.keepNonHealthCheck(col("user_agent")))
      .withColumn("status_code_type", F.categorizeStatus(col("elb_status_code")))
      .withColumn("waf_blocked", F.wafBlocked(col("classification_reason")))

  /** Wall-clock time features in US/Eastern (reference
    * `extract_time_features`, elb_logs.py:295-303). Instants stay UTC in
    * `time`; only the derived features see the zone conversion
    * (SURVEY.md §7.4 trap 3).
    */
  def extractTimeFeatures(df: DataFrame): DataFrame = {
    val eastern = from_utc_timestamp(col("time"), "America/New_York")
    df.withColumn("request_year", year(eastern))
      .withColumn("request_month", month(eastern))
      .withColumn("request_day", dayofmonth(eastern))
      .withColumn("request_hour", hour(eastern))
      .withColumn("request_day_of_week", date_format(eastern, "EEEE"))
      .withColumn("request_day_of_week_num", weekday(eastern))
      .withColumn("request_week_of_year", weekofyear(eastern))
  }

  /** reference `calculate_processing_times` (elb_logs.py:305-308). */
  def calculateProcessingTimes(df: DataFrame): DataFrame =
    df.withColumn("total_processing_time",
      F.totalProcessingTime(
        col("request_processing_time"),
        col("target_processing_time"),
        col("response_processing_time")))

  /** reference `add_path_features` (elb_logs.py:318-324). */
  def addPathFeatures(df: DataFrame): DataFrame =
    df.withColumn("path_depth", F.pathDepth(col("path")))
      .withColumn("path_main_segment", F.pathMainSegment(col("path")))
}
