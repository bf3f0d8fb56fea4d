package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Retry-envelope coverage mirroring rest_test.go: retry on 5xx (:73),
  * no-retry on 4xx (:166), empty-skip (:215), backoff clamp (rest.go:150-158).
  */
class RestSinkSpec extends AnyFunSuite {

  private def sink(statuses: Seq[Int], sleeps: ArrayBuffer[Long] = ArrayBuffer()):
      (RestSink, ArrayBuffer[String]) = {
    val calls = ArrayBuffer.empty[String]
    val it = Iterator(statuses: _*) ++ Iterator.continually(statuses.last)
    val s = new RestSink(
      post = p => { calls += p; it.next() },
      sleep = ms => { sleeps += ms; () },
      jitter = () => 1.0)
    (s, calls)
  }

  test("2xx delivers on first attempt") {
    val (s, calls) = sink(Seq(200))
    assert(s.send("""{"upserts":[1]}""") == s.Delivered)
    assert(calls.size == 1)
  }

  test("5xx retries up to 3 times then exhausts (rest_test.go:73)") {
    val (s, calls) = sink(Seq(500, 502, 503, 500))
    assert(s.send("""{"upserts":[1]}""") == s.Exhausted(500))
    assert(calls.size == 4) // initial + 3 retries
  }

  test("recovers when a retry succeeds") {
    val (s, calls) = sink(Seq(500, 200))
    assert(s.send("""{"upserts":[1]}""") == s.Delivered)
    assert(calls.size == 2)
  }

  test("4xx fails fast with no retry (rest_test.go:166)") {
    val (s, calls) = sink(Seq(400))
    assert(s.send("""{"upserts":[1]}""") == s.ClientError(400))
    assert(calls.size == 1)
  }

  test("transport exceptions are retryable") {
    var first = true
    val s = new RestSink(
      post = _ => if (first) { first = false; throw new java.io.IOException("conn reset") }
        else 200,
      sleep = _ => (), jitter = () => 1.0)
    assert(s.send("""{"deletes":["x"]}""") == s.Delivered)
  }

  test("empty payloads are skipped without a request (rest_test.go:215)") {
    val (s, calls) = sink(Seq(200))
    assert(s.send("") == s.SkippedEmpty)
    assert(s.send("{}") == s.SkippedEmpty)
    assert(s.send(null) == s.SkippedEmpty)
    assert(calls.isEmpty)
  }

  test("backoff doubles from 1s and clamps at 30s (rest.go:150-158)") {
    val (s, _) = sink(Seq(200))
    assert(s.backoffMs(0) == 1000)
    assert(s.backoffMs(1) == 2000)
    assert(s.backoffMs(2) == 4000)
    assert(s.backoffMs(10) == 30000) // clamp
  }

  test("backoff jitter stays within 75-100%") {
    val s = new RestSink(post = _ => 200, sleep = _ => (), jitter = () => 0.75)
    assert(s.backoffMs(0) == 750)
  }

  test("deliver: exhausted retries fail the batch; 4xx drops without failing") {
    val (bad5xx, _) = sink(Seq(500, 500, 500, 500))
    intercept[java.io.IOException] {
      Payloads.deliver(bad5xx, Seq("""{"upserts":[1]}"""))
    } // transient → epoch replay
    val (bad4xx, calls) = sink(Seq(422))
    Payloads.deliver(bad4xx, Seq("""{"upserts":[1]}""")) // permanent → dropped, no throw
    assert(calls.size == 1)
  }

  test("sleeps happen between retries, not after the last") {
    val sleeps = ArrayBuffer.empty[Long]
    val (s, _) = sink(Seq(500, 500, 500, 500), sleeps)
    s.send("""{"upserts":[1]}""")
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L))
  }
}
