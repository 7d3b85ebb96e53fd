package graft.sources

/** Connector-side retry envelope with the reference's semantics
  * (ref shopify-etl/shopify_etl.py:294-331):
  *  - up to `maxRetries` attempts, exponential backoff base·2^attempt
  *    (ref 3·2^attempt seconds, :323-327)
  *  - rate-limit signals wait the server-suggested delay (ref 429
  *    Retry-After, default 60 s, :312-316)
  *
  * This wraps page *fetches* in a custom connector; Spark task retries
  * cover executor-side failures, so this never wraps relational work.
  */
object Retry {

  /** Signal carrying a server-suggested wait (HTTP 429 shape). */
  final case class RateLimited(retryAfterSeconds: Long)
    extends RuntimeException(s"rate limited, retry after ${retryAfterSeconds}s")

  /** Retry NOW, without transport backoff: the failure is already repaired
    * (e.g. a 401 whose stale token was just invalidated — the next attempt
    * re-authenticates; sleeping 3·2^n seconds first would stall every task
    * at every routine token-expiry window). Still counts one attempt, so a
    * refresh loop that never helps cannot spin forever. */
  final case class Immediate(reason: String) extends RuntimeException(reason)

  /** Do not retry at all: the failure cannot succeed on another attempt
    * (e.g. a 401 under a STATIC bearer — no refresh path exists, so five
    * backed-off retries only delay the inevitable error). */
  final case class Fatal(reason: String) extends RuntimeException(reason)

  def withRetries[T](maxRetries: Int = 5, baseDelayMs: Long = 3000,
                     sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      try return f()
      catch {
        case e: Fatal => throw e
        case e: Throwable =>
          last = e
          attempt += 1
          // no pointless sleep after the final failed attempt
          if (attempt < maxRetries) e match {
            case RateLimited(after) => sleep(after * 1000L) // server-directed wait
            case Immediate(_)       => ()                   // already repaired
            case _                  => sleep(baseDelayMs << (attempt - 1)) // base·2^attempt
          }
      }
    }
    throw last
  }
}
