package graft.sources

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** One HTTP exchange as the fetch seam sees it: status code + raw body. */
final case class RestResponse(status: Int, body: String)

/** Retry / pacing discipline of the reference's REST layer
  * (`src/exchanges/_base_.py:55-98` send_request: `retries=3`,
  * `retry_delay=1`s; `src/utils/http_session.py:17-21`: 15 s total
  * timeout; `_base_.py:138,282-288`: `sleep_ms=100` between paginated
  * window requests).
  */
final case class RetryPolicy(
    retries: Int = 3,
    retryDelayMs: Long = 1000L,
    timeoutMs: Long = 15000L,
    paceMs: Long = 100L)

/** The production half of the [[RestSource]] / [[graft.flows.SyncKlines]]
  * fetch seam: retry + pacing combinators over an injected single-attempt
  * transport, and a stdlib `HttpURLConnection` transport for when egress
  * exists. Everything is `(url: String) => RestResponse` so tests swap in
  * fakes (or a loopback server) and flows swap in fixtures — the discipline
  * around the transport is identical either way.
  *
  * Failure semantics mirror the reference exactly: a non-200 status is
  * retried after `retryDelayMs` (no sleep after the last attempt) and
  * exhaustion raises `HTTP request failed (status): url`; a TRANSPORT
  * exception (timeout, connection refused) propagates immediately without
  * retry — in the reference an aiohttp error is not caught by
  * `send_request`, it unwinds to the flow-level handler.
  */
object RestClient {

  /** Headers the reference session pins on every request
    * (`http_session.py:6-12`). */
  val DefaultHeaders: Map[String, String] = Map(
    "Accept" -> "application/json",
    "Accept-Encoding" -> "gzip",
    "Connection" -> "keep-alive")

  /** Wrap a single-attempt transport in the retry loop. `sleep` is
    * injectable so specs assert the backoff schedule without waiting it. */
  def withRetry(policy: RetryPolicy, sleep: Long => Unit = Thread.sleep)(
      transport: String => RestResponse): String => RestResponse = { url =>
    require(policy.retries >= 1,
      s"RetryPolicy.retries must be >= 1 (got ${policy.retries})")
    var last: RestResponse = null
    var attempt = 1
    var done: RestResponse = null
    while (done == null && attempt <= policy.retries) {
      val r = transport(url)
      if (r.status == 200) done = r
      else {
        last = r
        if (attempt < policy.retries) sleep(policy.retryDelayMs)
      }
      attempt += 1
    }
    if (done != null) done
    else throw new RuntimeException(
      s"HTTP request failed (${last.status}): $url")
  }

  /** Pace consecutive calls `paceMs` apart (the reference's 100 ms sleep
    * between paginated kline windows). Stateful — instantiate INSIDE the
    * partition (each Spark task deserializes its own closure copy, so a
    * per-instance var is task-local), e.g.
    * `it => { val f = RestClient.paced(...)(fetch); it.map(f) }`. */
  def paced[A, B](paceMs: Long, sleep: Long => Unit = Thread.sleep)(
      f: A => B): A => B = {
    var first = true
    a => {
      if (!first) sleep(paceMs)
      first = false
      f(a)
    }
  }

  /** Fully-disciplined fetch for one partition: pacing between requests,
    * retry within each. The shape [[graft.flows.SyncKlines.run]] expects
    * once a URL builder closes over (symbol, window). */
  def pacedRetrying(policy: RetryPolicy, sleep: Long => Unit = Thread.sleep)(
      transport: String => RestResponse): String => RestResponse =
    paced(policy.paceMs, sleep)(withRetry(policy, sleep)(transport))

  /** Stdlib blocking transport: GET `url` with the pinned headers and the
    * policy timeout on both connect and read. Reads the error stream on
    * non-200 so the retry loop sees the body the way the reference logs it.
    * Loopback-testable; in this sandbox nothing routes beyond localhost. */
  def httpTransport(policy: RetryPolicy = RetryPolicy(),
      headers: Map[String, String] = DefaultHeaders)
      : String => RestResponse = { url =>
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(policy.timeoutMs.toInt)
      conn.setReadTimeout(policy.timeoutMs.toInt)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      val status = conn.getResponseCode
      val stream =
        if (status >= 400) Option(conn.getErrorStream)
        else Option(conn.getInputStream)
      // the pinned session advertises Accept-Encoding: gzip, and unlike the
      // reference's aiohttp, HttpURLConnection does NOT transparently
      // decompress — honor the response's Content-Encoding here
      val gzipped = Option(conn.getContentEncoding)
        .exists(_.equalsIgnoreCase("gzip"))
      val body = stream.map { raw =>
        val s = if (gzipped) new java.util.zip.GZIPInputStream(raw) else raw
        try new String(s.readAllBytes(), StandardCharsets.UTF_8)
        finally s.close()
      }.getOrElse("")
      RestResponse(status, body)
    } finally conn.disconnect()
  }
}
