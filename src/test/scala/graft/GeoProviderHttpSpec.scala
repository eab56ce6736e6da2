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
}
