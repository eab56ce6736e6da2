package graft.sources

import java.sql.Timestamp

/** One geolocation record, keyed by `client_ip`
  * (reference elb_logs.py:157-163,174-209; FIXTURES.md §2). API failure
  * yields the `"Error"` sentinel strings with null lat/lon — a real row,
  * not an absent one, so the cache remembers failed lookups too.
  */
case class GeoRecord(
    client_ip: String,
    countryCode: String,
    countryName: String,
    regionName: String,
    city: String,
    lat: Option[Double],
    lon: Option[Double],
    isp: String,
    api_fetch_timestamp: Timestamp)

/** The one genuinely custom source in the pipeline (SURVEY.md §2 op 9):
  * per-IP geolocation lookup. Side-effecting and rate-limited in the HTTP
  * implementation, pure in the static one — swapping implementations is
  * what makes the enrichment pipeline deterministic under test
  * (SURVEY.md §7.4 trap 5).
  */
trait GeoProvider extends Serializable {
  def lookup(ip: String): GeoRecord

  /** Upper bound on concurrent lookup tasks, or None for a pure provider
    * that can fan out across the whole cluster. Rate-limited providers
    * return Some(1): their limit is global, so the fetch stage must be a
    * single task (the reference's sequential loop, elb_logs.py:413-419).
    */
  def maxParallelism: Option[Int] = None
}

object GeoProvider {
  def errorRecord(ip: String, at: Timestamp): GeoRecord =
    GeoRecord(ip, "Error", "Error", "Error", "Error", None, None, "Error", at)
}

/** Deterministic offline provider: geolocation derived from the IP's
  * octets by pure arithmetic, so a SQL oracle can re-derive the expected
  * enrichment without running the provider. `d % 97 == 0` simulates an
  * API failure (the Error-sentinel path). The injected `clock` replaces
  * `pd.Timestamp.now()` (reference elb_logs.py:183) for reproducibility.
  */
case class StaticGeoProvider(clock: Timestamp) extends GeoProvider {
  override def lookup(ip: String): GeoRecord = {
    val parts = ip.split('.')
    if (parts.length != 4) GeoProvider.errorRecord(ip, clock)
    else {
      val Array(_, b, c, d) = parts.map(p => scala.util.Try(p.toLong).getOrElse(-1L))
      if (b < 0 || c < 0 || d < 0 || d % 97 == 0) GeoProvider.errorRecord(ip, clock)
      else GeoRecord(
        client_ip = ip,
        countryCode = s"C${d % 5}",
        countryName = s"Country-${d % 5}",
        regionName = s"R${c % 10}",
        city = s"City-${(c + d) % 20}",
        lat = Some((d % 180) - 90 + 0.5),
        lon = Some((c % 360) - 180 + 0.25),
        isp = s"ISP-${b % 3}",
        api_fetch_timestamp = clock)
    }
  }
}

/** Live ip-api.com client mirroring the reference's
  * `fetch_geolocation_data` (elb_logs.py:166-209): 5 s timeout, failure
  * → Error sentinel, and a hard inter-request sleep for the free tier's
  * rate limit (the reference sleeps 0.6 s, elb_logs.py:417). Run on a
  * SINGLE partition (see GeoCache.fetch) so the limit is global, not
  * per-task. `baseUrl` is injectable so the wire path is testable
  * against a loopback HTTP server (GeoProviderHttpSpec) in this
  * zero-egress environment; the default is the reference's endpoint.
  *
  * Resilience knobs (both divergences from the reference, whose loop is
  * strictly single-attempt and uncapped — the defaults preserve that):
  *  - `maxRetries` > 0 retries TRANSIENT failures only — transport
  *    errors/timeouts and HTTP 429/5xx — with exponential backoff
  *    (`retryBackoffMillis · 2^attempt`) before emitting the sentinel.
  *    Semantic failures (API `"fail"` status, malformed body, other
  *    4xx) are deterministic and never retried.
  *  - `maxRequestsPerRun` caps HTTP requests issued by this provider
  *    instance (per run — the fetch stage is one task, so the instance
  *    IS the run); once spent, lookups return the sentinel without
  *    touching the network. Guards quota/billing when a cache refresh
  *    meets an unexpectedly large new-IP batch.
  */
class HttpGeoProvider(
    rateLimitMillis: Long = 600,
    timeoutMillis: Int = 5000,
    baseUrl: String = "http://ip-api.com/json",
    maxRetries: Int = 0,
    retryBackoffMillis: Long = 1000,
    maxRequestsPerRun: Long = Long.MaxValue)
    extends GeoProvider {
  require(maxRetries >= 0 && retryBackoffMillis >= 0 && maxRequestsPerRun > 0,
    s"bad resilience knobs: retries=$maxRetries backoff=$retryBackoffMillis cap=$maxRequestsPerRun")

  /** The free-tier limit is per-source-IP GLOBAL: one task, like the
    * reference's sequential loop.
    */
  override def maxParallelism: Option[Int] = Some(1)

  private val requestsIssued = new java.util.concurrent.atomic.AtomicLong(0)

  /** One wire attempt: Right(record) is final (success OR deterministic
    * failure); Left(reason) is transient and retry-eligible.
    */
  private def attemptFetch(ip: String, now: Timestamp): Either[String, GeoRecord] = {
    try {
      Thread.sleep(rateLimitMillis)
      val url = new java.net.URL(
        s"$baseUrl/$ip?fields=status,message,country,countryCode,region,regionName,city,lat,lon,isp,query")
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMillis)
      conn.setReadTimeout(timeoutMillis)
      val code = conn.getResponseCode
      if (code == 429 || code >= 500) {
        conn.disconnect()
        Left(s"http $code")
      } else if (code != 200) {
        conn.disconnect()
        Right(GeoProvider.errorRecord(ip, now)) // deterministic 4xx
      } else {
        val body = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
        conn.disconnect()
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(body)
        if (node.path("status").asText() == "success")
          Right(GeoRecord(
            client_ip = node.path("query").asText(ip),
            countryCode = node.path("countryCode").asText(null),
            countryName = node.path("country").asText(null),
            regionName = node.path("regionName").asText(null),
            city = node.path("city").asText(null),
            lat = if (node.hasNonNull("lat")) Some(node.path("lat").asDouble()) else None,
            lon = if (node.hasNonNull("lon")) Some(node.path("lon").asDouble()) else None,
            isp = node.path("isp").asText(null),
            api_fetch_timestamp = now))
        else Right(GeoProvider.errorRecord(ip, now)) // API-level fail: no retry
      }
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException =>
        Right(GeoProvider.errorRecord(ip, now)) // malformed body: deterministic
      case e: java.io.IOException => Left(e.getClass.getSimpleName) // transport: transient
      case _: Exception => Right(GeoProvider.errorRecord(ip, now))
    }
  }

  override def lookup(ip: String): GeoRecord = {
    val now = new Timestamp(System.currentTimeMillis())
    var attempt = 0
    while (attempt <= maxRetries) {
      if (requestsIssued.incrementAndGet() > maxRequestsPerRun)
        return GeoProvider.errorRecord(ip, now) // cap spent: stay off the wire
      attemptFetch(ip, now) match {
        case Right(rec) => return rec
        case Left(_) if attempt < maxRetries =>
          Thread.sleep(retryBackoffMillis << attempt)
        case Left(_) => return GeoProvider.errorRecord(ip, now)
      }
      attempt += 1
    }
    GeoProvider.errorRecord(ip, now) // unreachable; keeps the compiler total
  }
}
