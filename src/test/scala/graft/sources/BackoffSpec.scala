package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class BackoffSpec extends AnyFunSuite {

  test("schedule: 10ms doubling to 45s cap (reference substreams_stream.rs:62)") {
    assert(Backoff.delayMillis(0) === 10L)
    assert(Backoff.delayMillis(1) === 20L)
    assert(Backoff.delayMillis(2) === 40L)
    assert(Backoff.delayMillis(10) === 10240L)
    assert(Backoff.delayMillis(12) === 40960L)
    assert(Backoff.delayMillis(13) === 45000L)
    assert(Backoff.delayMillis(60) === 45000L)
    assert(Backoff.delayMillis(1000) === 45000L)
  }

  test("retry recovers after transient failures with the scheduled delays") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val out = Backoff.retry(maxAttempts = 5, sleep = delays.append(_)) { () =>
      calls += 1
      if (calls < 4) throw new RuntimeException("transient")
      "ok"
    }
    assert(out === "ok")
    assert(delays.toSeq === Seq(10L, 20L, 40L))
  }

  test("retries exhausted -> last error propagates") {
    val e = intercept[RuntimeException] {
      Backoff.retry(maxAttempts = 3, sleep = _ => ()) { () =>
        throw new RuntimeException("always")
      }
    }
    assert(e.getMessage === "always")
  }

  test("fatal errors abort without retrying (Unauthenticated parity)") {
    var calls = 0
    val e = intercept[Backoff.FatalException] {
      Backoff.retry(maxAttempts = 10,
        isFatal = _.getMessage == "unauthenticated", sleep = _ => ()) { () =>
        calls += 1
        throw new RuntimeException("unauthenticated")
      }
    }
    assert(calls === 1)
    assert(e.getCause.getMessage === "unauthenticated")
  }
}
