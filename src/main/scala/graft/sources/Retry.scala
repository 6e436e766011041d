package graft.sources

import scala.concurrent.duration._
import scala.util.control.NonFatal

import org.apache.spark.internal.Logging

/** Driver-side retry for filesystem/catalog operations (reference F4,
  * `retry.py:124-150`).
  *
  * In the Spark engine the executor-side story is already covered:
  * `spark.task.maxFailures` retries failed scan tasks and the Hadoop FS
  * clients carry their own transport retries, so the reference's
  * decorate-every-read approach is unnecessary there. What remains is
  * driver-side metadata work (catalog glob, metadata.json read/write),
  * which this small exponential-backoff helper wraps.
  *
  * Env parity: `PINECONE_DATASETS_RETRY_MAX_ATTEMPTS`, `..._MIN_WAIT`,
  * `..._MAX_WAIT` (seconds), `PINECONE_DATASETS_DISABLE_RETRY`
  * (reference `retry.py:30-52,133-138`).
  */
object Retry extends Logging {

  final case class Policy(maxAttempts: Int, minWait: FiniteDuration, maxWait: FiniteDuration)

  def policyFromEnv(env: Map[String, String] = sys.env): Policy = {
    def num(k: String, d: Double): Double =
      env.get(k).flatMap(v => scala.util.Try(v.toDouble).toOption).getOrElse(d)
    if (env.get("PINECONE_DATASETS_DISABLE_RETRY").exists(v => v == "1" || v.equalsIgnoreCase("true")))
      Policy(1, Duration.Zero, Duration.Zero)
    else Policy(
      num("PINECONE_DATASETS_RETRY_MAX_ATTEMPTS", 3).toInt.max(1),
      num("PINECONE_DATASETS_RETRY_MIN_WAIT", 1).seconds,
      num("PINECONE_DATASETS_RETRY_MAX_WAIT", 10).seconds)
  }

  /** Retryable = connection/timeout-shaped errors, mirroring the reference's
    * classification heuristics (`retry.py:55-111`). Validation and
    * not-found errors are never retried.
    */
  def isRetryable(e: Throwable): Boolean = e match {
    case _: java.net.SocketTimeoutException | _: java.net.ConnectException |
        _: java.net.UnknownHostException | _: java.io.InterruptedIOException => true
    case _: java.io.FileNotFoundException | _: IllegalArgumentException |
        _: NoSuchElementException => false
    case NonFatal(t) =>
      val msg = Option(t.getMessage).getOrElse("").toLowerCase
      Seq("connection reset", "connection refused", "timed out", "timeout",
        "broken pipe", "temporarily unavailable").exists(msg.contains)
    case _ => false
  }

  def apply[T](op: String, policy: Policy = policyFromEnv())(f: => T): T = {
    var attempt = 1
    var wait = policy.minWait
    while (true) {
      try return f
      catch {
        case NonFatal(e) if attempt < policy.maxAttempts && isRetryable(e) =>
          logWarning(s"$op failed (attempt $attempt/${policy.maxAttempts}): " +
            s"${e.getMessage}; retrying in $wait")
          Thread.sleep(wait.toMillis)
          wait = (wait * 2).min(policy.maxWait).asInstanceOf[FiniteDuration]
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
