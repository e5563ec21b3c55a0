package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.LocalDate
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{FreshnessCheck, NoopNotifier, BufferingNotifier, WebhookNotifier}

/** S14 — the webhook notifier: a REAL HTTP POST (reference
  * SlackNotifier.py:4-9), asserted against a local in-process server. */
class NotifierSpec extends AnyFunSuite {

  private case class Captured(method: String, contentType: String,
      body: String)

  /** Starts a one-shot capture server; returns (url, queue). */
  private def captureServer(): (HttpServer, String,
      LinkedBlockingQueue[Captured]) = {
    val q = new LinkedBlockingQueue[Captured]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        q.put(Captured(ex.getRequestMethod,
          ex.getRequestHeaders.getFirst("Content-Type"), body))
        ex.sendResponseHeaders(200, 2)
        ex.getResponseBody.write("ok".getBytes(StandardCharsets.UTF_8))
        ex.close()
      }
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
    (server, url, q)
  }

  test("WebhookNotifier POSTs the reference JSON body") {
    val (server, url, q) = captureServer()
    try {
      new WebhookNotifier(url, "cig-info-monitor", "graft-etl")
        .notify("PROD/Accounts is stale")
      val c = q.poll(10, TimeUnit.SECONDS)
      assert(c != null, "no request captured")
      assert(c.method == "POST")
      assert(c.contentType == "application/json")
      assert(c.body ==
        """{"text":"PROD/Accounts is stale","channel":"cig-info-monitor","username":"graft-etl"}""")
    } finally server.stop(0)
  }

  test("WebhookNotifier escapes quotes, newlines and control chars") {
    val (server, url, q) = captureServer()
    try {
      val n = new WebhookNotifier(url, "c", "u")
      n.notify("a\"b\\c\nd\tef")
      val c = q.poll(10, TimeUnit.SECONDS)
      assert(c != null)
      assert(c.body ==
        "{\"text\":\"a\\\"b\\\\c\\nd\\tef\",\"channel\":\"c\",\"username\":\"u\"}")
      // chars below 0x20 without a short escape take the \ u NNNN path
      assert(n.body("x" + 1.toChar + "y") ==
        "{\"text\":\"x\\u0001y\",\"channel\":\"c\",\"username\":\"u\"}")
    } finally server.stop(0)
  }

  test("fromEnv: no URL configured -> Noop; URL -> webhook with defaults") {
    assert(WebhookNotifier.fromEnv(Map.empty) eq NoopNotifier)
    val n = WebhookNotifier.fromEnv(
      Map("GRAFT_WEBHOOK_URL" -> "http://127.0.0.1:1/hook"))
    assert(n.isInstanceOf[WebhookNotifier])
    assert(n.asInstanceOf[WebhookNotifier].body("m") ==
      """{"text":"m","channel":"cig-info-monitor","username":"graft-etl"}""")
  }

  test("checkAndNotify posts one line per stale source over real HTTP") {
    val spark = TestSession.spark
    import spark.implicits._
    val latest = Seq(
      ("PROD", "Accounts", "2026-08-01"),
      ("PROD", "Orders", "2026-08-12"),
      ("ACC", "Accounts", "2026-07-15"))
      .toDF("environment", "source_name", "d")
      .selectExpr("environment", "source_name",
        "CAST(d AS DATE) AS latest_date")
    val (server, url, q) = captureServer()
    try {
      val n = new WebhookNotifier(url, "cig-info-monitor", "graft-etl")
      val stale = FreshnessCheck.checkAndNotify(spark, latest, Nil, Nil,
        LocalDate.parse("2026-08-12"), n)
      assert(stale.toSeq == Seq(
        ("ACC", "Accounts", "2026-07-15"),
        ("PROD", "Accounts", "2026-08-01")))
      val c = q.poll(10, TimeUnit.SECONDS)
      assert(c != null)
      assert(c.body.contains("Tables not up to date (2):"))
      assert(c.body.contains("ACC/Accounts latest=2026-07-15"))
      assert(c.body.contains("PROD/Accounts latest=2026-08-01"))
    } finally server.stop(0)
  }

  test("checkAndNotify stays silent when everything is fresh") {
    val spark = TestSession.spark
    import spark.implicits._
    val latest = Seq(("PROD", "Accounts", "2026-08-12"))
      .toDF("environment", "source_name", "d")
      .selectExpr("environment", "source_name",
        "CAST(d AS DATE) AS latest_date")
    val buf = new BufferingNotifier
    val stale = FreshnessCheck.checkAndNotify(spark, latest, Nil, Nil,
      LocalDate.parse("2026-08-12"), buf)
    assert(stale.isEmpty)
    assert(buf.messages.isEmpty)
  }
}
