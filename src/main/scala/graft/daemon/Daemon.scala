package graft.daemon

import graft.runtime.{StagePhase, StageState, Tether}
import scala.concurrent.duration._

/** Pipeline supervisor — the reference's `Daemon`
  * (`/root/reference/gasket/src/daemon.rs:13-86`): polls every stage's
  * liveness, stops when terminated externally or when ANY stage ends,
  * stalls (Blocked) or dies (Dropped), then tears down in two phases —
  * dismiss-all first, join-all second (`daemon.rs:59-77`) — so slow
  * stages shut down concurrently, not serially.
  *
  * `registerShutdownHook` replaces the reference's OS signal hooks with
  * the JVM equivalent — and like the reference it is ON by default
  * (`daemon.rs:17-25` always registers TERM handlers): SIGTERM/SIGINT
  * gracefully drains every stage (dismiss-all, join-all). Opt out for
  * embedded use where the host owns signal handling.
  */
final class Daemon(
    tethers: Seq[Tether],
    pollEvery: FiniteDuration = 100.millis,
    registerShutdownHook: Boolean = true) {

  @volatile private var terminated = false
  private val hook =
    if (registerShutdownHook) Some(sys.addShutdownHook { terminate(); teardown() })
    else None

  /** Whether this daemon drains its stages on JVM shutdown (TERM/INT). */
  def shutdownHookInstalled: Boolean = hook.isDefined

  def terminate(): Unit = { terminated = true }
  def isTerminated: Boolean = terminated

  /** Any stage Ended / Blocked / Dropped ⇒ the pipeline is over —
    * `daemon.rs:36-43`. */
  def hasEnded: Boolean = tethers.exists { t =>
    t.checkState() match {
      case StageState.Alive(StagePhase.Ended) => true
      case StageState.Blocked | StageState.Dropped => true
      case _ => false
    }
  }

  /** Block until the pipeline ends, then tear everything down —
    * `daemon.rs:79-85` (poll period is configurable; reference: 1500 ms). */
  def block(): Unit = {
    while (!terminated && !hasEnded) Thread.sleep(pollEvery.toMillis)
    teardown()
  }

  /** Two-phase graceful stop: pass 1 dismisses every stage, pass 2 joins
    * every thread — `daemon.rs:59-77`. Also removes the shutdown hook: a
    * pipeline that already drained must not leak a hook per Daemon in
    * long-lived JVMs (no-op if the JVM is itself shutting down). */
  def teardown(joinTimeout: FiniteDuration = 30.seconds): Unit = {
    tethers.foreach(_.dismiss())
    tethers.foreach(_.join(joinTimeout))
    hook.foreach(h => try h.remove() catch { case _: IllegalStateException => () })
  }
}
