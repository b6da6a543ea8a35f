package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** Retry/backoff discipline of the fetch seam (reference
  * `_base_.py:55-98`), without egress: fake transports for the schedule,
  * a loopback JDK HttpServer for the real HttpURLConnection transport.
  */
class RestClientSpec extends AnyFunSuite {

  private def recordingSleep(log: ArrayBuffer[Long]): Long => Unit =
    ms => log += ms

  test("non-200 retries with 1s delay, succeeds on a later attempt") {
    val sleeps = ArrayBuffer.empty[Long]
    val statuses = Iterator(500, 503, 200)
    val fetch = RestClient.withRetry(RetryPolicy(), recordingSleep(sleeps)) {
      url => RestResponse(statuses.next(), s"body:$url")
    }
    val r = fetch("http://x/klines")
    assert(r.status == 200 && r.body == "body:http://x/klines")
    assert(sleeps.toSeq == Seq(1000L, 1000L)) // one delay per failed attempt
  }

  test("exhausted retries raise with last status and url; no sleep after last") {
    val sleeps = ArrayBuffer.empty[Long]
    val calls = new AtomicInteger
    val fetch = RestClient.withRetry(RetryPolicy(), recordingSleep(sleeps)) {
      _ => { calls.incrementAndGet(); RestResponse(429, "slow down") }
    }
    val e = intercept[RuntimeException](fetch("http://x/depth"))
    assert(e.getMessage == "HTTP request failed (429): http://x/depth")
    assert(calls.get == 3)            // retries == total attempts, like the ref
    assert(sleeps.toSeq == Seq(1000L, 1000L)) // not after the final failure
  }

  test("transport exceptions propagate immediately, un-retried") {
    val calls = new AtomicInteger
    val fetch = RestClient.withRetry(RetryPolicy(), _ => ()) { _ =>
      calls.incrementAndGet()
      throw new java.net.SocketTimeoutException("read timed out")
    }
    intercept[java.net.SocketTimeoutException](fetch("http://x/t"))
    assert(calls.get == 1)
  }

  test("pacing sleeps between consecutive calls, not before the first") {
    val sleeps = ArrayBuffer.empty[Long]
    val f = RestClient.paced(100L, recordingSleep(sleeps))((i: Int) => i * 2)
    assert(Seq(1, 2, 3).map(f) == Seq(2, 4, 6))
    assert(sleeps.toSeq == Seq(100L, 100L))
  }

  test("pacedRetrying composes: pace between windows, retry within each") {
    val sleeps = ArrayBuffer.empty[Long]
    var n = 0
    val fetch = RestClient.pacedRetrying(RetryPolicy(),
      recordingSleep(sleeps)) { url =>
      n += 1
      if (n == 2) RestResponse(500, "") else RestResponse(200, url)
    }
    assert(fetch("w1").status == 200)      // attempt 1 ok
    assert(fetch("w2").status == 200)      // pace, fail once, delay, ok
    assert(sleeps.toSeq == Seq(100L, 1000L))
  }

  test("transport decompresses gzip responses (Accept-Encoding is honored)") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/gz", { ex =>
      val buf = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(buf)
      gz.write("""{"ok":true}""".getBytes("UTF-8")); gz.close()
      val bytes = buf.toByteArray
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val r = RestClient.httpTransport()(
        s"http://127.0.0.1:${server.getAddress.getPort}/gz")
      assert(r.status == 200 && r.body == """{"ok":true}""")
    } finally server.stop(0)
  }

  test("HttpURLConnection transport against loopback: headers, retry, body") {
    val seen = ArrayBuffer.empty[String]
    val hits = new AtomicInteger
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v3/klines", { ex =>
      seen += ex.getRequestHeaders.getFirst("Accept")
      val (status, body) =
        if (hits.incrementAndGet() < 3) (502, """{"err":"bad gateway"}""")
        else (200, """[[1704067200000,"1"]]""")
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url =
        s"http://127.0.0.1:${server.getAddress.getPort}/api/v3/klines?symbol=BTCUSDT"
      val sleeps = ArrayBuffer.empty[Long]
      val fetch = RestClient.withRetry(RetryPolicy(),
        recordingSleep(sleeps))(RestClient.httpTransport())
      val r = fetch(url)
      assert(r.status == 200 && r.body.startsWith("[[1704067200000"))
      assert(hits.get == 3 && sleeps.size == 2)
      assert(seen.forall(_ == "application/json")) // pinned session headers
    } finally server.stop(0)
  }
}
