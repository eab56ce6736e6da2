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

  def multimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.attachPayload(
      Tables.distributed(spark, sfDir, "documents"), "doc_id", "text")
    Multimodal.resizeStub(media, targetW = 128, targetH = 128).toDF()
  }

  def multimodalFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.attachPayload(
      Tables.distributed(spark, sfDir, "documents"), "doc_id", "text")
    Multimodal.sampleFramesStub(media, everyN = 30).toDF()
  }

  def streamingSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val events = StreamingPipeline.readEvents(spark, sfDir)
    StreamingPipeline.runToMemory(
      StreamingPipeline.sessionAgg(events), "graft_stream_sessions")
      .select("user_id", "session_start", "session_end", "n_events")
  }

  /** The row-level streaming sessionizer (batch `{key}_s{n}` ids)
    * through the real streaming engine. Gap semantics match both the
    * batch sessionizer and session_window (all strictly >, boundary
    * pinned by StreamingSpec); this query is the oracle-checked proof.
    */
  def streamingSessionIds(spark: SparkSession, sfDir: String): DataFrame = {
    val events = StreamingPipeline.readEvents(spark, sfDir)
    StreamingPipeline.runToMemory(
      StreamingPipeline.sessionIds(events).toDF(),
      "graft_stream_session_ids",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select("event_id", "user_id", "ts", "session_id")
  }

  /** Streaming twin of exact dedup: distinct content hashes through
    * the real streaming engine's dropDuplicates state store.
    */
  def streamingDedup(spark: SparkSession, sfDir: String): DataFrame =
    StreamingPipeline.runToMemory(
      StreamingPipeline.dedupHashes(
        StreamingPipeline.readDocuments(spark, sfDir)),
      "graft_stream_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())

  /** Same-user event pairs within 5 minutes through the real streaming
    * engine's watermarked stream-stream join state.
    */
  def streamingEventPairs(spark: SparkSession, sfDir: String): DataFrame =
    StreamingPipeline.runToMemory(
      StreamingPipeline.eventPairsStream(
        StreamingPipeline.readEvents(spark, sfDir)),
      "graft_stream_event_pairs",
      org.apache.spark.sql.streaming.OutputMode.Append())

  /** Incremental dedup through the real streaming engine: the 20%
    * "fresh" split streams in and is band-matched against the static
    * 80% base-corpus band table (stream-static join + one stateful
    * min aggregation). Output: every flagged fresh doc with its
    * smallest matching base id — the streaming twin of
    * `dedup_incremental`'s dup rows.
    */
  def streamingIncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.{Dedup, Sampling}
    val t80 = Sampling.fractionThreshold(0.8)
    def isBase = md5(concat(lit("inc:"), col("doc_id").cast("string"))) < lit(t80)
    val base = Tables.distributed(spark, sfDir, "documents")
      .select("doc_id", "text").where(isBase)
    val baseBands = Dedup.lshBands(
        Dedup.minhashSignatureTable(base, "doc_id", "text", 3, 9), "doc_id", 9, 3)
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("_base_id"))
    val fresh = StreamingPipeline.readDocuments(spark, sfDir)
      .where(!isBase).select("doc_id", "text")
    StreamingPipeline.runToMemory(
      StreamingPipeline.incrementalDupStream(fresh, baseBands),
      "graft_stream_inc_dedup")
  }

  /** The reference's cron-driven cache refresh through the streaming
    * engine: events-derived client IPs stream into foreachBatch, each
    * batch runs detect-fetch-upsert-swap against a real parquet cache
    * path, and the query returns the final persisted cache (fully
    * deterministic with the static provider and fixed clock).
    */
  def streamingGeoCache(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-cache")
    val cachePath = dir.resolve("geolocation_cache.parquet").toString
    val ips = StreamingPipeline.readEvents(spark, sfDir).select(
      concat(lit("10."), col("user_id") % 200, lit("."), col("event_id") % 250,
        lit("."), (col("event_id") * 7) % 250).as("client_ip"))
    val q = StreamingPipeline.cacheRefreshStream(ips, cachePath,
      graft.sources.StaticGeoProvider(JoinQueries.FixedClock))
    q.awaitTermination()
    spark.read.schema(graft.operators.GeoCache.schema).parquet(cachePath)
  }

  def streamingHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val events = StreamingPipeline.readEvents(spark, sfDir)
    StreamingPipeline.runToMemory(
      StreamingPipeline.hourlyAgg(events), "graft_stream_hourly")
  }

  /** Reproducible train/val/test assignment + an independent 25%
    * sample flag, both pure functions of the row id.
    */
  def sampleSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sampling
    Sampling.assignSplit(
        Tables.events(spark, sfDir).select("event_id", "user_id"),
        "event_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .withColumn("in_quarter_sample",
        md5(concat(lit("sample:"), col("event_id").cast("string")))
          < lit(Sampling.fractionThreshold(0.25)))
  }

  /** Temperature-weighted corpus mixing: a ~50% budget drawn with
    * per-source shares following √n instead of n (small sources
    * up-weighted), membership a pure function of doc_id.
    */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Sampling.temperatureMixture(
      Tables.documents(spark, sfDir).select("doc_id", "source"),
      idCol = "doc_id", groupCol = "source", budgetFraction = 0.5)
      .select("doc_id", "source")

  /** Deterministic per-group downsample: at most 20 docs per language. */
  def capPerGroup(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Sampling.capPerGroup(
      Tables.documents(spark, sfDir).select("doc_id", "lang"),
      groupCol = "lang", idCol = "doc_id", cap = 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split" -> sampleSplit,
    "cap_per_group" -> capPerGroup,
    "mixture_sample" -> mixtureSample,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_resize" -> multimodalResize,
    "multimodal_frames" -> multimodalFrames,
    "streaming_sessions" -> streamingSessions,
    "streaming_session_ids" -> streamingSessionIds,
    "streaming_hourly" -> streamingHourly,
    "streaming_dedup" -> streamingDedup,
    "streaming_event_pairs" -> streamingEventPairs,
    "streaming_incremental_dedup" -> streamingIncrementalDedup,
    "streaming_geo_cache" -> streamingGeoCache
  )

  private val t80 = graft.operators.Sampling.fractionThreshold(0.8)
  private val t90 = graft.operators.Sampling.fractionThreshold(0.9)
  private val t25 = graft.operators.Sampling.fractionThreshold(0.25)

  val oracle: Map[String, String] = Map(
    "sample_split" ->
      s"""SELECT event_id, user_id,
         |  CASE WHEN md5('split:' || CAST(event_id AS VARCHAR)) < '$t80' THEN 'train'
         |       WHEN md5('split:' || CAST(event_id AS VARCHAR)) < '$t90' THEN 'val'
         |       ELSE 'test' END AS split,
         |  md5('sample:' || CAST(event_id AS VARCHAR)) < '$t25' AS in_quarter_sample
         |FROM events""".stripMargin,
    "streaming_event_pairs" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000""".stripMargin,
    "streaming_incremental_dedup" ->
      s"""WITH shr AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(words) - 2),
         |    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
         |sigs AS (SELECT doc_id,
         |    ${(0 until 9).map(s => s"min(md5('$s:' || sh)) AS sig_$s").mkString(", ")}
         |  FROM shr GROUP BY doc_id),
         |bands AS (${(0 until 3).map { b =>
             val cat = (b * 3 until b * 3 + 3).map(s => s"sig_$s").mkString(" || ")
             s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_hash FROM sigs"
           }.mkString(" UNION ALL ")}),
         |m AS (SELECT doc_id,
         |        md5('inc:' || CAST(doc_id AS VARCHAR))
         |          < '${graft.operators.Sampling.fractionThreshold(0.8)}' AS is_base
         |      FROM documents)
         |SELECT f.doc_id, min(b.doc_id) AS dup_of
         |FROM bands f JOIN m mf ON f.doc_id = mf.doc_id AND NOT mf.is_base
         |JOIN bands b ON f.band_idx = b.band_idx AND f.band_hash = b.band_hash
         |JOIN m mb ON b.doc_id = mb.doc_id AND mb.is_base
         |GROUP BY f.doc_id""".stripMargin,
    "mixture_sample" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
        |      FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |        CAST(sum(w) AS BIGINT) AS wsum FROM c),
        |f AS (SELECT c.source,
        |        least(1.0,
        |          CAST(CAST(floor(CAST(t.total AS DOUBLE) * 0.5) AS BIGINT)
        |              * c.w AS DOUBLE)
        |            / CAST(t.wsum * c.n AS DOUBLE)) AS fr
        |      FROM c CROSS JOIN t)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN f ON d.source = f.source
        |WHERE CAST(concat('0x',
        |    substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)::DOUBLE
        |  / 1152921504606846976.0 < f.fr""".stripMargin,
    "cap_per_group" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 20""".stripMargin,
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
        |      OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sn FROM d)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sn""".stripMargin,
    "streaming_session_ids" ->
      """WITH d AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sn FROM d)
        |SELECT event_id, user_id, ts,
        |  user_id || '_s' || sn AS session_id
        |FROM s""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(128 AS INT) AS width, CAST(128 AS INT) AS height,
        |  CAST(least(octet_length(text::BLOB), 256) AS BIGINT) AS out_len,
        |  md5(substr(text, 1, least(octet_length(text::BLOB), 256))) AS checksum
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id, text, octet_length(text::BLOB) AS len,
        |             doc_id % 300 + 1 AS n_frames FROM documents),
        |idx AS (SELECT doc_id, text, len,
        |          unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 30)) AS i
        |        FROM m)
        |SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
        |  md5(substr(text,
        |    CAST(CASE WHEN len <= 32 THEN 0 ELSE (i * 97) % (len - 31) END AS BIGINT) + 1,
        |    32)) AS frame_md5
        |FROM idx""".stripMargin,
    "streaming_dedup" ->
      "SELECT DISTINCT md5(text) AS text_hash FROM documents",
    "streaming_geo_cache" ->
      """SELECT DISTINCT
        |  '10.' || b || '.' || c || '.' || d AS client_ip,
        |  CASE WHEN d % 97 = 0 THEN 'Error' ELSE 'C' || (d % 5) END AS countryCode,
        |  CASE WHEN d % 97 = 0 THEN 'Error' ELSE 'Country-' || (d % 5) END AS countryName,
        |  CASE WHEN d % 97 = 0 THEN 'Error' ELSE 'R' || (c % 10) END AS regionName,
        |  CASE WHEN d % 97 = 0 THEN 'Error' ELSE 'City-' || ((c + d) % 20) END AS city,
        |  CASE WHEN d % 97 = 0 THEN NULL ELSE (d % 180) - 90 + 0.5 END AS lat,
        |  CASE WHEN d % 97 = 0 THEN NULL ELSE (c % 360) - 180 + 0.25 END AS lon,
        |  CASE WHEN d % 97 = 0 THEN 'Error' ELSE 'ISP-' || (b % 3) END AS isp,
        |  TIMESTAMP '2026-01-01 00:00:00' AS api_fetch_timestamp
        |FROM (SELECT user_id % 200 AS b, event_id % 250 AS c,
        |        (event_id*7) % 250 AS d FROM events)""".stripMargin,
    "streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
