package graft.sinks

/** K7: the alerting side channel (`powerbi_main_fun.py:80,95-96` Slack
  * failure notifications). Not a data sink — an interface the
  * pipelines call on quarantine/failure, so tests and offline runs
  * inject a collector and production wires a webhook client. Kept
  * driver-side: executors report errors as DATA (quarantine rows),
  * never by calling external services from tasks.
  */
object Alerts {

  trait Channel {
    def send(severity: String, message: String): Unit
  }

  /** Default: structured log line (stderr), the zero-dependency form. */
  object LogChannel extends Channel {
    def send(severity: String, message: String): Unit =
      System.err.println(s"[alert][$severity] $message")
  }

  /** Test/offline collector. */
  final class Collecting extends Channel {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def send(severity: String, message: String): Unit =
      sent += ((severity, message))
  }
}
