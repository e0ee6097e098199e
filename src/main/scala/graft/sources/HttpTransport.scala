package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.atomic.AtomicLong

import com.fasterxml.jackson.databind.ObjectMapper

/** Concrete HTTP JSON-RPC transport (`VCOClient.py:75-98` semantics):
  *
  *  - every call POSTs a JSON-RPC 2.0 envelope
  *    `{"jsonrpc":"2.0","id":<seqno>,"method":…,"params":…}` to the
  *    single `/portal/` endpoint (method names arrive stripped of
  *    leading/trailing slashes, `VCOClient.py:52-57`);
  *  - auth is the `Authorization: Token <token>` header
  *    (`VCOClient.py:101-103`);
  *  - a response body with an `error` key is a failure carrying
  *    `error.message` (`VCOClient.py:95-97`) — surfaced as `Left`, the
  *    Transport contract's exception analog, which
  *    [[VcoSource.callWithRetry]] then retries;
  *  - a successful body's `result` is returned; arrays become one
  *    compact-JSON line per element (the line-oriented shape every
  *    downstream reader consumes), scalars/objects a single line.
  *
  * Built on `java.net.http.HttpClient` (JDK 11+) and the Jackson
  * mapper Spark already ships — no added dependency. The client is
  * `@transient lazy`: transports serialize into executor-side readers
  * ([[VcoDataSource]]), and sockets must be constructed AFTER the hop.
  */
class HttpTransport(baseUrl: String, authToken: String,
    timeoutSeconds: Long = 30) extends VcoSource.Transport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds))
      .build()

  @transient private lazy val mapper = new ObjectMapper()

  private val seqno = new AtomicLong(0L)

  override def call(method: String,
      paramsJson: String): Either[String, Seq[String]] =
    try {
      val cleanMethod = method.stripPrefix("/").stripSuffix("/")
      val payload =
        s"""{"jsonrpc":"2.0","id":${seqno.incrementAndGet()},""" +
          s""""method":${mapper.writeValueAsString(cleanMethod)},""" +
          s""""params":$paramsJson}"""
      val req = HttpRequest.newBuilder(
          URI.create(s"${baseUrl.stripSuffix("/")}/portal/"))
        .timeout(Duration.ofSeconds(timeoutSeconds))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Token $authToken")
        .POST(HttpRequest.BodyPublishers.ofString(payload))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        Left(s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      else {
        val root = mapper.readTree(resp.body())
        if (root.has("error"))
          Left(Option(root.get("error").get("message"))
            .map(_.asText()).getOrElse("unknown API error"))
        else if (!root.has("result"))
          Left("response has neither 'result' nor 'error'")
        else {
          val result = root.get("result")
          if (result.isArray) {
            val it = result.elements()
            val buf = Seq.newBuilder[String]
            while (it.hasNext) buf += mapper.writeValueAsString(it.next())
            Right(buf.result())
          } else Right(Seq(mapper.writeValueAsString(result)))
        }
      }
    } catch {
      case e: Exception =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}
