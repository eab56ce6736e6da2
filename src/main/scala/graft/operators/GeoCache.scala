package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{GeoProvider, GeoRecord}

/** The geolocation-cache micro-pipeline (SURVEY.md §3.3): keyed parquet
  * cache, new-key detection, rate-limited fetch, dedup-keep-newest
  * upsert, and the broadcast enrichment join.
  */
object GeoCache {

  val schema: StructType = StructType(Seq(
    StructField("client_ip", StringType),
    StructField("countryCode", StringType),
    StructField("countryName", StringType),
    StructField("regionName", StringType),
    StructField("city", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("isp", StringType),
    StructField("api_fetch_timestamp", TimestampType)))

  /** Load the cache; absent path → empty typed table (reference
    * `load_geolocation_cache`, elb_logs.py:150-163, which catches ONLY
    * FileNotFoundError). Any other failure — permissions, corrupt
    * footer, transient store error — rethrows: swallowing it would
    * silently present an empty cache, mass-refetch every IP through the
    * rate-limited provider, and overwrite the accumulated cache.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    try {
      val df = spark.read.schema(schema).parquet(path)
      df.queryExecution.analyzed // force resolution so a missing path throws here
      df
    } catch {
      case e: Exception if isPathNotFound(e) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private def isPathNotFound(e: Throwable): Boolean = e match {
    case _: java.io.FileNotFoundException => true
    case a: org.apache.spark.sql.AnalysisException =>
      a.getCondition == "PATH_NOT_FOUND"
    case _ => false
  }

  /** Distinct probe-side keys absent from the cache (reference
    * elb_logs.py:408-409): distinct + LEFT ANTI join. The cache side is
    * small (one row per distinct IP ever seen) so Catalyst broadcasts it;
    * the distinct is the only shuffle and it is on the already-projected
    * single key column.
    */
  def newIps(logs: DataFrame, cache: DataFrame, ipCol: String = "client_ip"): DataFrame =
    logs.select(col(ipCol).as("_probe_ip")).where(col("_probe_ip").isNotNull).distinct()
      .join(broadcast(cache.select(col("client_ip").as("_cache_ip"))),
        col("_probe_ip") === col("_cache_ip"), "left_anti")
      .select(col("_probe_ip").as(ipCol))

  /** Fetch geolocation for each new IP via the provider, at the
    * provider's declared parallelism: a rate-limited HTTP provider
    * declares `maxParallelism = Some(1)` and runs as one task, exactly
    * like the reference's sequential loop (elb_logs.py:413-419) — its
    * throughput is bounded by the API (≤1.67 req/s), not Spark. A pure
    * provider (static lookup table, paid tier) declares None and keeps
    * the upstream distinct's partitioning, fanning out across the
    * cluster.
    */
  def fetch(newIps: Dataset[String], provider: GeoProvider): Dataset[GeoRecord] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[GeoRecord]
    val sized = provider.maxParallelism match {
      case Some(n) => newIps.coalesce(n)
      case None    => newIps
    }
    sized.mapPartitions(_.map(provider.lookup))
  }

  /** Keyed upsert, keep-newest (reference `update_geolocation_cache`,
    * elb_logs.py:212-228): union old+new, keep the row with the highest
    * `api_fetch_timestamp` per key. pandas' stable sort keeps the OLD row
    * on a timestamp tie (old rows precede new in the concat), so ties
    * break toward `_src = 0`.
    */
  def upsert(
      oldCache: DataFrame,
      fresh: DataFrame,
      keyCol: String = "client_ip",
      tsCol: String = "api_fetch_timestamp",
      tieBreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val unioned = oldCache.withColumn("_src", lit(0))
      .unionByName(fresh.withColumn("_src", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc +: col("_src").asc +: tieBreak: _*)
    unioned.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Enrichment left equi-join (reference `merge_geocachedf_with_elbdf`,
    * elb_logs.py:231-238). The cache has one row per distinct IP —
    * orders of magnitude smaller than the log table — so it is broadcast:
    * no shuffle of the (huge) probe side, and the join stays inside the
    * scan stage's codegen. Row count is preserved (key unique on the
    * build side by [[upsert]]).
    */
  def enrich(logs: DataFrame, cache: DataFrame): DataFrame =
    logs.join(broadcast(cache), Seq("client_ip"), "left")

  /** Full refresh cycle: detect new IPs, fetch them, upsert into the
    * cache (SURVEY.md §3.3 `GeoCache.refresh`).
    */
  def refresh(logs: DataFrame, oldCache: DataFrame, provider: GeoProvider): DataFrame = {
    import logs.sparkSession.implicits._
    val fresh = fetch(newIps(logs, oldCache).as[String], provider)
    upsert(oldCache, fresh.toDF())
  }
}
