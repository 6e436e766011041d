package graft

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry

/** Mirrors the reference's retry tier (`tests/unit/test_retry.py:14-135`):
  * env-var policy parity, retryable classification, attempt counting and
  * the non-retryable short-circuit.
  */
class RetrySpec extends AnyFunSuite {

  private val fast = Retry.Policy(3, 1.millis, 4.millis)

  test("env parity: defaults, overrides, disable flag") {
    assert(Retry.policyFromEnv(Map.empty) == Retry.Policy(3, 1.second, 10.seconds))
    assert(Retry.policyFromEnv(Map(
      "PINECONE_DATASETS_RETRY_MAX_ATTEMPTS" -> "5",
      "PINECONE_DATASETS_RETRY_MIN_WAIT" -> "2",
      "PINECONE_DATASETS_RETRY_MAX_WAIT" -> "30")) ==
      Retry.Policy(5, 2.seconds, 30.seconds))
    // disable flag wins over everything (retry.py:133-138)
    assert(Retry.policyFromEnv(Map(
      "PINECONE_DATASETS_DISABLE_RETRY" -> "true",
      "PINECONE_DATASETS_RETRY_MAX_ATTEMPTS" -> "7")) ==
      Retry.Policy(1, Duration.Zero, Duration.Zero))
    // malformed numbers fall back to defaults, floor at 1 attempt
    assert(Retry.policyFromEnv(Map(
      "PINECONE_DATASETS_RETRY_MAX_ATTEMPTS" -> "bogus")).maxAttempts == 3)
    assert(Retry.policyFromEnv(Map(
      "PINECONE_DATASETS_RETRY_MAX_ATTEMPTS" -> "0")).maxAttempts == 1)
  }

  test("retryable classification (retry.py:55-111 heuristics)") {
    assert(Retry.isRetryable(new java.net.SocketTimeoutException("read timed out")))
    assert(Retry.isRetryable(new java.net.ConnectException("refused")))
    assert(Retry.isRetryable(new java.io.IOException("Connection reset by peer")))
    assert(Retry.isRetryable(new RuntimeException("operation timed out")))
    assert(!Retry.isRetryable(new java.io.FileNotFoundException("gone")))
    assert(!Retry.isRetryable(new IllegalArgumentException("bad schema")))
    assert(!Retry.isRetryable(new RuntimeException("validation failed")))
  }

  test("retries transient failures then succeeds; attempts are counted") {
    var calls = 0
    val out = Retry("op", fast) {
      calls += 1
      if (calls < 3) throw new java.net.SocketTimeoutException("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 3)
  }

  test("exhausted attempts rethrow the last error") {
    var calls = 0
    val e = intercept[java.net.ConnectException] {
      Retry[Unit]("op", fast) { calls += 1; throw new java.net.ConnectException("down") }
    }
    assert(e.getMessage == "down" && calls == fast.maxAttempts)
  }

  test("non-retryable errors short-circuit on the first attempt") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry[Unit]("op", fast) { calls += 1; throw new IllegalArgumentException("no") }
    }
    assert(calls == 1)
  }

  test("disabled policy means exactly one attempt even for retryable errors") {
    var calls = 0
    intercept[java.net.ConnectException] {
      Retry[Unit]("op", Retry.Policy(1, Duration.Zero, Duration.Zero)) {
        calls += 1; throw new java.net.ConnectException("down")
      }
    }
    assert(calls == 1)
  }
}
