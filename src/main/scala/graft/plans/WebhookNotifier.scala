package graft.plans

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP webhook [[Notifier]] — the real transport behind the monitor's
  * out-of-data-path alerts (reference `SlackNotifier.py:4-9`: a POST of
  * `{"text": …, "channel": …, "username": …}` to an incoming-webhook
  * URL). The reference hardcodes URL/channel/username; here they are
  * constructor config so production injects its endpoint and tests POST
  * to a local server.
  *
  * Matching the reference's semantics, the response status is not
  * inspected (fire-and-forget post); transport-level failures (refused
  * connection, timeout) propagate to the caller, which sits OUTSIDE the
  * data path — a dead webhook can fail the monitor run, never the
  * ingestion job.
  */
final class WebhookNotifier(url: String, channel: String, username: String,
    timeoutSeconds: Long = 10) extends Notifier {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .build()

  /** Minimal JSON string escape: quote, backslash, and control chars —
    * everything RFC 8259 requires for a string literal. */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  def body(text: String): String =
    s"""{"text":${jstr(text)},"channel":${jstr(channel)},"username":${jstr(username)}}"""

  def notify(text: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body(text)))
      .build()
    client.send(req, HttpResponse.BodyHandlers.discarding())
    ()
  }
}

object WebhookNotifier {
  /** Config-driven factory: with no webhook URL configured the monitor
    * stays silent ([[NoopNotifier]]) — notification is opt-in, exactly
    * the hermetic default the tests rely on. */
  def fromEnv(env: Map[String, String] = sys.env): Notifier =
    env.get("GRAFT_WEBHOOK_URL") match {
      case Some(url) =>
        new WebhookNotifier(url,
          env.getOrElse("GRAFT_WEBHOOK_CHANNEL", "cig-info-monitor"),
          env.getOrElse("GRAFT_WEBHOOK_USERNAME", "graft-etl"))
      case None => NoopNotifier
    }
}
