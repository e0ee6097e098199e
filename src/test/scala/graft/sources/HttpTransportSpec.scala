package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Wire-level contract of [[HttpTransport]] against a localhost stub:
  * JSON-RPC envelope + auth header on the request, result-array →
  * lines, error-key → Left with the API message, HTTP status → Left.
  * No Spark session needed — the transport is plain JVM.
  */
class HttpTransportSpec extends AnyFunSuite {

  /** One-shot stub server; records the last request. */
  private def withServer(respond: String => (Int, String))(
      f: (String, () => (String, String)) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastBody = ""
    @volatile var lastAuth = ""
    server.createContext("/portal/", (ex: HttpExchange) => {
      lastBody = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("")
      val (status, body) = respond(lastBody)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}",
      () => (lastBody, lastAuth))
    finally server.stop(0)
  }

  test("envelope, auth header, and result-array lines") {
    withServer(_ => (200,
      """{"jsonrpc":"2.0","id":1,"result":[{"id":1,"name":"e1"},{"id":2}]}""")) {
      (url, last) =>
        val t = new HttpTransport(url, "tok-123")
        val out = t.call("/enterprise/getEnterpriseEdges/", """{"with":[]}""")
        assert(out === Right(Seq("""{"id":1,"name":"e1"}""", """{"id":2}""")))
        val (body, auth) = last()
        assert(auth === "Token tok-123")
        assert(body.contains(""""jsonrpc":"2.0""""))
        // leading/trailing slashes stripped (VCOClient._clean_method_name)
        assert(body.contains(""""method":"enterprise/getEnterpriseEdges""""))
        assert(body.contains(""""params":{"with":[]}"""))
    }
  }

  test("error key becomes Left with the API message") {
    withServer(_ => (200,
      """{"jsonrpc":"2.0","id":1,"error":{"code":-32000,"message":"no such enterprise"}}""")) {
      (url, _) =>
        val t = new HttpTransport(url, "tok")
        assert(t.call("m", "{}") === Left("no such enterprise"))
    }
  }

  test("non-2xx status and connect failure become Left (retryable)") {
    withServer(_ => (503, "overloaded")) { (url, _) =>
      val t = new HttpTransport(url, "tok")
      assert(t.call("m", "{}").swap.exists(_.startsWith("HTTP 503")))
    }
    // nothing listens here: the transport reports, never throws —
    // callWithRetry owns the retry loop
    val dead = new HttpTransport("http://127.0.0.1:1", "tok",
      timeoutSeconds = 2)
    assert(dead.call("m", "{}").isLeft)
  }

  test("scalar result comes back as a single line") {
    withServer(_ => (200, """{"result":{"version":"5.2.0"}}""")) {
      (url, _) =>
        val t = new HttpTransport(url, "tok")
        assert(t.call("getVcoVersion", "{}") ===
          Right(Seq("""{"version":"5.2.0"}""")))
    }
  }
}
