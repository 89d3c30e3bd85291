package graft.runtime

/** Scheduling verdict returned by [[Worker.schedule]] — the reference's
  * `WorkSchedule<U>` (`/root/reference/gasket/src/framework.rs:81-88`). */
sealed trait WorkSchedule[+U]
object WorkSchedule {
  /** Nothing to do right now; the runtime idles briefly and re-schedules. */
  case object Idle extends WorkSchedule[Nothing]
  /** One unit of work ready for execution. */
  final case class Unit[U](unit: U) extends WorkSchedule[U]
  /** Input exhausted; the stage should tear down. */
  case object Done extends WorkSchedule[Nothing]
}

/** Error escalation policy — the reference's `WorkerError` variants
  * (`framework.rs:20-79`): a failure inside a worker phase is classified
  * as retry-the-unit, restart-the-stage, or fail-the-stage. Any other
  * exception escaping a worker phase is treated as [[WorkerError.Panic]].
  */
sealed abstract class WorkerError(message: String, cause: Throwable)
    extends RuntimeException(message, cause)
object WorkerError {
  /** Retry the same phase/unit under the phase's [[RetryPolicy]]. */
  final case class Retry(cause: Throwable)
      extends WorkerError(s"retryable: ${cause.getMessage}", cause)
  /** Tear down and bootstrap the stage again. */
  final case class Restart(cause: Throwable)
      extends WorkerError(s"restart: ${cause.getMessage}", cause)
  /** Unrecoverable: fail the stage. */
  final case class Panic(cause: Throwable)
      extends WorkerError(s"panic: ${cause.getMessage}", cause)

  /** Sugar matching the reference's `.or_retry()` / `.or_restart()` /
    * `.or_panic()` combinators (`framework.rs:37-79`). */
  implicit final class EscalateOps[A](private val body: () => A) extends AnyVal {
    def orRetry(): A = wrap(Retry(_))
    def orRestart(): A = wrap(Restart(_))
    def orPanic(): A = wrap(Panic(_))
    private def wrap(f: Throwable => WorkerError): A =
      try body() catch {
        case e: WorkerError => throw e
        case e: InterruptedException => throw e
        case scala.util.control.NonFatal(e) => throw f(e)
      }
  }
}

/** Stage lifecycle contract — the reference's `Worker` trait
  * (`framework.rs:90-135`): bootstrap → (schedule → execute)* → teardown.
  * Implementations run on a dedicated supervision thread (one per stage,
  * like the reference's thread-per-stage runtime, `runtime.rs:446-470`);
  * blocking calls should stay interruptible so dismissal is timely.
  */
trait Worker[U] {
  def bootstrap(): Unit = ()
  def schedule(): WorkSchedule[U]
  def execute(unit: U): Unit
  def teardown(): Unit = ()
}
