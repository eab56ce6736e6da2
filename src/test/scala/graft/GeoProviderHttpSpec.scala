package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpGeoProvider

/** Exercises the REAL HTTP wire path of HttpGeoProvider against a
  * loopback server speaking ip-api.com's JSON shape — success, API-level
  * failure (status != success), malformed body, and connection error all
  * land exactly where the reference's fetch_geolocation_data would put
  * them (elb_logs.py:166-209). No Spark session needed: the provider is
  * a plain serializable client.
  */
class GeoProviderHttpSpec extends AnyFunSuite {

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      test(server, s"http://127.0.0.1:${server.getAddress.getPort}/json")
    } finally server.stop(0)
  }

  private def reply(ex: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("success response maps every field; error status and garbage map to sentinel") {
    withServer { (server, base) =>
      server.createContext("/json/1.2.3.4", (ex: HttpExchange) => reply(ex,
        """{"status":"success","query":"1.2.3.4","country":"Testland",
          |"countryCode":"TL","regionName":"Testregion","city":"Testville",
          |"lat":12.5,"lon":-33.25,"isp":"TestISP"}""".stripMargin))
      server.createContext("/json/9.9.9.9", (ex: HttpExchange) => reply(ex,
        """{"status":"fail","message":"private range","query":"9.9.9.9"}"""))
      server.createContext("/json/8.8.8.8", (ex: HttpExchange) => reply(ex,
        "this is not json"))

      val p = new HttpGeoProvider(rateLimitMillis = 0, baseUrl = base)
      val ok = p.lookup("1.2.3.4")
      assert(ok.client_ip === "1.2.3.4")
      assert(ok.countryCode === "TL")
      assert(ok.countryName === "Testland")
      assert(ok.regionName === "Testregion")
      assert(ok.city === "Testville")
      assert(ok.lat === Some(12.5) && ok.lon === Some(-33.25))
      assert(ok.isp === "TestISP")

      val fail = p.lookup("9.9.9.9")
      assert(fail.countryCode === "Error" && fail.lat === None)

      val garbage = p.lookup("8.8.8.8")
      assert(garbage.countryCode === "Error")
    }
  }

  test("connection refused maps to the sentinel, not an exception") {
    // bind-then-close to get a port with nothing listening
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    server.stop(0)
    val p = new HttpGeoProvider(
      rateLimitMillis = 0, timeoutMillis = 500,
      baseUrl = s"http://127.0.0.1:$port/json")
    assert(p.lookup("1.1.1.1").countryCode === "Error")
  }

  private def replyCode(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("5xx retries with backoff until success; single-attempt default stays sentinel") {
    withServer { (server, base) =>
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/json/5.5.5.5", (ex: HttpExchange) =>
        if (calls.incrementAndGet() <= 2) replyCode(ex, 503)
        else reply(ex, """{"status":"success","query":"5.5.5.5","country":"Late",
          |"countryCode":"LT","regionName":"R","city":"C","lat":1.0,"lon":2.0,
          |"isp":"I"}""".stripMargin))

      // reference-default single attempt: sentinel after the first 503
      val strict = new HttpGeoProvider(rateLimitMillis = 0, baseUrl = base)
      assert(strict.lookup("5.5.5.5").countryCode === "Error")
      assert(calls.get() === 1)

      // two retries ride through both 503s to the success body
      calls.set(0)
      val retrying = new HttpGeoProvider(rateLimitMillis = 0, baseUrl = base,
        maxRetries = 2, retryBackoffMillis = 1)
      val ok = retrying.lookup("5.5.5.5")
      assert(ok.countryCode === "LT" && calls.get() === 3)
    }
  }

  test("429 is transient (retried); API fail-status and 404 are deterministic (never retried)") {
    withServer { (server, base) =>
      val limited = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/json/4.2.9.1", (ex: HttpExchange) =>
        if (limited.incrementAndGet() == 1) replyCode(ex, 429)
        else reply(ex, """{"status":"success","query":"4.2.9.1","country":"X",
          |"countryCode":"XX","regionName":"R","city":"C","lat":0.5,"lon":0.5,
          |"isp":"I"}""".stripMargin))
      val failCalls = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/json/9.9.9.9", (ex: HttpExchange) => {
        failCalls.incrementAndGet()
        reply(ex, """{"status":"fail","message":"private range","query":"9.9.9.9"}""")
      })
      val nfCalls = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/json/4.0.4.1", (ex: HttpExchange) => {
        nfCalls.incrementAndGet()
        replyCode(ex, 404)
      })

      val p = new HttpGeoProvider(rateLimitMillis = 0, baseUrl = base,
        maxRetries = 3, retryBackoffMillis = 1)
      assert(p.lookup("4.2.9.1").countryCode === "XX")
      assert(limited.get() === 2, "one 429, one retry, no more")
      assert(p.lookup("9.9.9.9").countryCode === "Error")
      assert(failCalls.get() === 1, "semantic API failure must not retry")
      assert(p.lookup("4.0.4.1").countryCode === "Error")
      assert(nfCalls.get() === 1, "4xx is deterministic; no retry")
    }
  }

  test("per-run request cap: lookups beyond the cap return the sentinel off-wire") {
    withServer { (server, base) =>
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/json", (ex: HttpExchange) => {
        calls.incrementAndGet()
        reply(ex, """{"status":"success","query":"q","country":"X",
          |"countryCode":"XX","regionName":"R","city":"C","lat":0.5,"lon":0.5,
          |"isp":"I"}""".stripMargin)
      })
      val p = new HttpGeoProvider(rateLimitMillis = 0, baseUrl = base,
        maxRequestsPerRun = 2)
      assert(p.lookup("1.0.0.1").countryCode === "XX")
      assert(p.lookup("1.0.0.2").countryCode === "XX")
      assert(p.lookup("1.0.0.3").countryCode === "Error")
      assert(p.lookup("1.0.0.4").countryCode === "Error")
      assert(calls.get() === 2, "capped lookups must not touch the network")
    }
  }
}
