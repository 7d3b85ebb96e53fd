package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures with exponential backoff (ref 3*2^attempt)") {
    val sleeps = ArrayBuffer[Long]()
    var calls = 0
    val out = Retry.withRetries(maxRetries = 5, baseDelayMs = 3000, sleep = sleeps += _) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok")
    assert(calls == 3)
    assert(sleeps.toSeq == Seq(3000L, 6000L))
  }

  test("rate-limit waits the server-suggested delay (ref 429 Retry-After)") {
    val sleeps = ArrayBuffer[Long]()
    var calls = 0
    Retry.withRetries(maxRetries = 3, sleep = sleeps += _) { () =>
      calls += 1
      if (calls == 1) throw Retry.RateLimited(60)
      "ok"
    }
    assert(sleeps.toSeq == Seq(60000L))
  }

  test("exhausted retries rethrow the last error without a trailing sleep") {
    val sleeps = ArrayBuffer[Long]()
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries(maxRetries = 4, baseDelayMs = 3000, sleep = sleeps += _) { () =>
        calls += 1; throw new RuntimeException(s"boom $calls")
      }
    }
    assert(calls == 4)
    assert(e.getMessage == "boom 4")
    assert(sleeps.size == 3, "no sleep after the final failed attempt")
  }

  test("Immediate retries without sleeping but still consumes an attempt") {
    val sleeps = ArrayBuffer[Long]()
    var calls = 0
    val out = Retry.withRetries(maxRetries = 3, baseDelayMs = 3000, sleep = sleeps += _) { () =>
      calls += 1
      if (calls == 1) throw Retry.Immediate("token refreshed")
      "ok"
    }
    assert(out == "ok" && calls == 2)
    assert(sleeps.isEmpty, "a repaired failure must not pay transport backoff")
    // but it cannot spin forever: attempts are still counted
    var n = 0
    intercept[Retry.Immediate] {
      Retry.withRetries(maxRetries = 3, sleep = sleeps += _) { () =>
        n += 1; throw Retry.Immediate("never helps")
      }
    }
    assert(n == 3)
  }

  test("Fatal aborts on the first attempt with no retry and no sleep") {
    val sleeps = ArrayBuffer[Long]()
    var calls = 0
    intercept[Retry.Fatal] {
      Retry.withRetries(maxRetries = 5, sleep = sleeps += _) { () =>
        calls += 1; throw Retry.Fatal("bad static credentials")
      }
    }
    assert(calls == 1 && sleeps.isEmpty)
  }
}
