package graft.runtime

import scala.concurrent.duration._

/** Per-phase retry policy with capped exponential backoff.
  *
  * Mirrors the reference semantics of `retries::Policy`
  * (`/root/reference/gasket/src/retries.rs:49-72`): `maxRetries` attempts
  * beyond the first, delay `backoffUnit * backoffFactor^retry` capped at
  * `maxBackoff` (`retries.rs:74-78`), and `dismissible` — after the last
  * retry the failing unit is skipped instead of failing the stage
  * (`retries.rs:16-26`).
  */
final case class RetryPolicy(
    maxRetries: Int = 0,
    backoffUnit: FiniteDuration = 1.milli,
    backoffFactor: Long = 2,
    maxBackoff: FiniteDuration = 100.millis,
    dismissible: Boolean = false) {

  /** `backoff_unit × backoff_factor^retry`, capped — `retries.rs:74-78`.
    * Computed in doubles and clamped BEFORE constructing the duration so
    * large retry counts saturate at maxBackoff instead of overflowing
    * (FiniteDuration multiplication throws past Long.MaxValue ns). */
  def backoffDelay(retry: Int): FiniteDuration = {
    val ns = backoffUnit.toNanos.toDouble *
      math.pow(backoffFactor.toDouble, retry.toDouble)
    if (!ns.isFinite || ns >= maxBackoff.toNanos.toDouble) maxBackoff
    else ns.toLong.nanos
  }
}

/** Per-stage supervision knobs — `runtime.rs:422-439`. Defaults match the
  * reference (`Policy::default()`: no retries, 5 s tick timeout). */
final case class Policy(
    tickTimeout: FiniteDuration = 5.seconds,
    bootstrapRetry: RetryPolicy = RetryPolicy(),
    workRetry: RetryPolicy = RetryPolicy(),
    teardownRetry: RetryPolicy = RetryPolicy())
