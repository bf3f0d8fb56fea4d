package graft.pipeline

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** The production HTTP transport against a real local server: JSON body and
  * content-type on the wire, and the retry envelope driven by actual HTTP
  * statuses instead of an injected function.
  */
class HttpTransportSpec extends AnyFunSuite {

  private def withServer(statuses: Seq[Int])(
      f: (String, java.util.List[String], java.util.List[String]) => Unit): Unit = {
    val bodies = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val ctypes = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val calls = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/api/v1/instances/sync", (ex: HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      ctypes.add(ex.getRequestHeaders.getFirst("Content-Type"))
      val status = statuses(math.min(calls.getAndIncrement(), statuses.size - 1))
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api/v1/instances/sync",
      bodies, ctypes)
    finally server.stop(0)
  }

  test("POSTs the payload as application/json and reads the status") {
    withServer(Seq(200)) { (endpoint, bodies, ctypes) =>
      val sink = RestSink.http(endpoint)
      val r = sink.send("""{"upserts":[{"id":"a"}]}""")
      assert(r == sink.Delivered)
      assert(bodies.get(0) == """{"upserts":[{"id":"a"}]}""")
      assert(ctypes.get(0) == "application/json")
    }
  }

  test("5xx then 2xx recovers through the real transport") {
    withServer(Seq(503, 200)) { (endpoint, bodies, _) =>
      val sink = RestSink.http(endpoint,
        RetryConfig(initialBackoffMs = 1, maxBackoffMs = 2))
      assert(sink.send("""{"deletes":["x"]}""") == sink.Delivered)
      assert(bodies.size == 2) // one retry, same body both times
      assert(bodies.get(0) == bodies.get(1))
    }
  }

  test("connection refused surfaces as a retryable transport error, then exhausts") {
    // unroutable local port: nothing listens
    val sink = RestSink.http("http://127.0.0.1:1/never",
      RetryConfig(maxRetries = 1, initialBackoffMs = 1, maxBackoffMs = 1))
    sink.send("""{"deletes":["x"]}""") match {
      case sink.Exhausted(status) => assert(status == 599)
      case other => fail(s"expected Exhausted(599), got $other")
    }
  }
}
