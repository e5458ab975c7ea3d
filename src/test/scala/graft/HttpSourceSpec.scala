package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{HttpSource, QueryString, RestApiException, RestConnectionException}

/** S6/S7/T2: the real `java.net.http` RestSource and the query-string
  * builder, exercised network-free against a loopback fixture server
  * (no egress — the socket never leaves 127.0.0.1).
  */
class HttpSourceSpec extends AnyFunSuite {

  // ---------------------------------------------------------- T2 builder

  test("query string: form-encoding with space→'+' (reference convention)") {
    // main.py:227 `ciudad.replace(" ", "+")`
    assert(QueryString.encode(Seq("name" -> "La Plata", "count" -> "1")) ===
      "name=La+Plata&count=1")
    // reserved chars escaped, not mangled
    assert(QueryString.encode(Seq("q" -> "a&b=c")) === "q=a%26b%3Dc")
  }

  test("query string: base URL separator handling") {
    assert(QueryString.url("http://h/api", Seq("a" -> "1")) ===
      "http://h/api?a=1")
    // the reference's config bases end mid-query (main.py:196-199)
    assert(QueryString.url("http://h/api?", Seq("a" -> "1")) ===
      "http://h/api?a=1")
    assert(QueryString.url("http://h/api?x=0", Seq("a" -> "1")) ===
      "http://h/api?x=0&a=1")
    assert(QueryString.url("http://h/api?x=0&", Seq("a" -> "1")) ===
      "http://h/api?x=0&a=1")
    assert(QueryString.url("http://h/api?x=0", Nil) === "http://h/api?x=0")
  }

  // ------------------------------------------------- loopback HTTP round

  private def withServer(bodyFor: String => String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => {
      val body = bodyFor(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
        .getBytes(UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api")
    finally server.stop(0)
  }

  test("fetch: GET with encoded params, body returned verbatim") {
    withServer(q => s"""{"echo": "$q"}""") { base =>
      val got = new HttpSource(base)
        .fetch(Map("name" -> "La Plata", "count" -> "1"))
      assert(got === """{"echo": "count=1&name=La+Plata"}""")
    }
  }

  test("fetch: top-level 'error' key raises (main.py:184-185 parity)") {
    withServer(_ => """{"error": true, "reason": "Invalid coordinates"}""") {
      base =>
        intercept[RestApiException] { new HttpSource(base).fetch(Map.empty) }
    }
    // 'error' nested deeper is NOT the reference's check — must pass
    withServer(_ => """{"current": {"error": "nope"}}""") { base =>
      assert(new HttpSource(base).fetch(Map.empty).nonEmpty)
    }
  }

  test("fetch: reference request URLs built from the typed param helpers") {
    withServer(q => s"""{"echo": "$q"}""") { base =>
      // weather (main.py:195-196): latitude/longitude from the locality
      val w = new HttpSource(base)
        .fetch(graft.ingest.Ingest.weatherParams(-34.92145, -57.95453))
      assert(w === """{"echo": "latitude=-34.92145&longitude=-57.95453"}""")
      // geocoding (main.py:227-229): name/count/language/format, space→'+'
      val g = new HttpSource(base)
        .fetch(graft.ingest.Ingest.geocodingParams("La Plata", nres = 10))
      assert(g ===
        """{"echo": "count=10&format=json&language=es&name=La+Plata"}""")
    }
  }

  test("fetch: non-2xx status raises RestApiException") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => {
      val body = "oops".getBytes(UTF_8)
      ex.sendResponseHeaders(500, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val ex = intercept[RestApiException] {
        new HttpSource(s"http://127.0.0.1:${server.getAddress.getPort}/api")
          .fetch(Map.empty)
      }
      assert(ex.getMessage.contains("HTTP 500"))
    } finally server.stop(0)
  }

  test("fetch: connection failure wraps in RestConnectionException") {
    // unroutable port on loopback — connection refused, no egress
    intercept[RestConnectionException] {
      new HttpSource("http://127.0.0.1:1/api",
        java.time.Duration.ofMillis(500)).fetch(Map.empty)
    }
  }
}
