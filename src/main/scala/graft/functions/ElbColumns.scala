package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions for the ELB pipeline — all pure Catalyst
  * expressions (no UDFs) so every stage stays codegen'd and
  * filter-pushdown-friendly at 100 TB scale.
  */
object ElbColumns {

  /** Quote-aware tokenizer (reference elb_logs.py:76, `shlex.split`).
    *
    * ELB fields are space-separated; quoted fields (`request`,
    * `user_agent`, …) may contain spaces. A token is either a
    * double-quoted run or a maximal non-space run — exactly the grammar
    * ELB emits, so `regexp_extract_all` suffices and stays codegen'd
    * (SURVEY.md §2 op 10 prefers regexp over a UDF).
    */
  def elbTokenize(line: Column): Column =
    regexp_extract_all(line, lit("\"[^\"]*\"|\\S+"), lit(0))

  // Quote-stripping lives in the codegen'd ElbUnquote / ElbParseFields
  // expressions (see those files for why the builtin formulations — a
  // regexp_replace per field, a when/substr per field, or an array-wide
  // transform — each fell out of whole-stage codegen on the 29-field
  // parse projection).

  /** Strict ELB timestamp: `%Y-%m-%dT%H:%M:%S.%fZ` → UTC instant
    * (reference elb_logs.py:83). Unparseable → null (caller drops row).
    */
  def parseElbTime(s: Column): Column =
    try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))

  /** Lenient timestamp (reference's `pd.to_datetime`, elb_logs.py:86):
    * failure → null, row kept.
    *
    * The bare `try_to_timestamp` is Spark's lenient cast parser and
    * already covers ISO forms with offsets (`+00:00`), any fractional
    * precision (ns truncates to µs, like pandas→parquet), space or `T`
    * separators, and date-only strings. The explicit formats extend it
    * to the remaining common pandas/dateutil shapes: slashed and
    * compact dates, and US month-first. Branches are tried in frequency
    * order and coalesce short-circuits, so well-formed rows pay one
    * parse. RFC-1123 (`Tue, 01 Jan 2026 00:00:00 GMT`) and asctime —
    * inexpressible in Spark's post-3.0 pattern dialect (`EEE` is
    * rejected in parse patterns) — are handled by the codegen'd
    * [[JavaTimeTimestamp]] java.time branch, placed last so only rows
    * failing every builtin format reach its exception-based slow path.
    */
  def parseLenientTime(s: Column): Column =
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(s),
      try_to_timestamp(s, lit("yyyy/MM/dd HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy/MM/dd")),
      try_to_timestamp(s, lit("yyyyMMdd")),
      try_to_timestamp(s, lit("MM/dd/yyyy HH:mm:ss")),
      try_to_timestamp(s, lit("MM/dd/yyyy")),
      JavaTimeTimestamp.java_time_timestamp(s))

  /** Float coercion with `'-'` sentinel → null (reference elb_logs.py:91-95). */
  def coerceFloat(c: Column): Column =
    when(c === "-", lit(null)).otherwise(c.try_cast("double"))

  /** A float field is acceptable iff it is the sentinel or parseable —
    * anything else drops the row (float() raising in the reference).
    */
  def floatRowOk(c: Column): Column =
    (c === "-") || c.try_cast("double").isNotNull

  /** Int coercion via the reference's `isdigit()` rule (elb_logs.py:96-97):
    * all-digits → long, else null. Signs/decimals are rejected on purpose.
    */
  def coerceInt(c: Column): Column =
    when(c.rlike("^[0-9]+$"), c.cast("long")).otherwise(lit(null))

  /** `client_ip_port.split(':')[0]` (reference elb_logs.py:100). */
  def clientIp(ipPort: Column): Column = substring_index(ipPort, ":", 1)

  /** Port embedded in a URL authority, or null (urlparse().port). */
  def urlPort(url: Column): Column =
    nullif(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+)", 1), lit("")).try_cast("long")

  /** Status bucketing (reference elb_logs.py:260-268). Label strings are
    * load-bearing — they are filter/join keys downstream.
    */
  def categorizeStatus(code: Column): Column =
    when(code.isNull, lit("Unknown"))
      .when(code >= 100 && code < 200, lit("1xx_Informational"))
      .when(code >= 200 && code < 300, lit("2xx_Success"))
      .when(code >= 300 && code < 400, lit("3xx_Redirection"))
      .when(code >= 400 && code < 500, lit("4xx_ClientError"))
      .when(code >= 500 && code < 600, lit("5xx_ServerError"))
      .otherwise(lit("Other"))

  /** WAF-block predicate (reference elb_logs.py:254-256): case-insensitive
    * `waf|blocked|deny` in classification_reason, null → false.
    */
  def wafBlocked(reason: Column): Column =
    coalesce(lower(reason).rlike("waf|blocked|deny"), lit(false))

  /** Row-wise null-as-zero sum of the three processing times
    * (reference elb_logs.py:305-308).
    */
  def totalProcessingTime(a: Column, b: Column, c: Column): Column =
    coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)) + coalesce(c, lit(0.0))

  /** Count of non-empty `/`-segments (reference elb_logs.py:320). */
  def pathDepth(path: Column): Column =
    size(filter(split(coalesce(path, lit("")), "/"), s => s =!= ""))

  /** `path.split('/')[1]` if present else `''` (reference elb_logs.py:323):
    * for `/api/v1` this is `api` (index 1 lands after the leading empty
    * token of the split).
    */
  def pathMainSegment(path: Column): Column =
    coalesce(get(split(coalesce(path, lit("")), "/"), lit(1)), lit(""))
}
