package graft.streaming

import graft.runtime._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import scala.concurrent.duration._

/** Unbounded-flow layer: gasket stages over infinite inputs map to
  * Structured Streaming queries (SURVEY.md §2.1 #13,17-23 streaming side).
  *
  * Event-time is NEW capability relative to the reference — gasket only
  * has processing-time ticks (`TimerPort`,
  * `/root/reference/gasket/src/messaging.rs:151-209`); watermarks /
  * windows / stateful sessionization are the engine obligations
  * (SURVEY.md §2.2 streaming row).
  */
object EventTime {

  /** Tumbling event-time windows by key with a watermark for late-data
    * eviction. Partial aggregation happens map-side per micro-batch;
    * state is bounded by the watermark at any scale. */
  def windowedAgg(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(graft.ops.Q.D6)).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionAgg(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, cnt: Long, total: Double)

  /** Gap-based sessionization with explicit custom state — the Spark
    * analogue of a stateful gasket `Worker` (arbitrary state inside
    * `Worker::execute`, `framework.rs:125`): state lives in
    * `GroupState`, partitioned by key, checkpointable, spillable.
    * Emits a session once the gap elapses within the observed stream.
    */
  def sessionize(events: Dataset[Ev], gap: FiniteDuration)(
      implicit spark: SparkSession): Dataset[SessionAgg] = {
    import spark.implicits._
    val gapMs = gap.toMillis
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionAgg]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs > gapMs =>
                closed += SessionAgg(uid, s.startMs, s.lastMs, s.cnt, s.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case Some(s) =>
                cur = Some(s.copy(lastMs = math.max(s.lastMs, t), cnt = s.cnt + 1,
                  total = s.total + e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}

/** Supervise a streaming query under the graft stage runtime: liveness via
  * the Tether, graceful stop on dismiss, and — the capability Spark lacks
  * natively (SURVEY.md §4.2 retry row) — automatic query RESTART with the
  * stage's bootstrap backoff policy when the query fails.
  */
final class StreamingWorker(start: () => StreamingQuery) extends Worker[Unit] {
  @volatile private[streaming] var query: StreamingQuery = _

  override def bootstrap(): Unit = { query = start() }

  override def schedule(): WorkSchedule[Unit] = {
    val q = query
    if (q == null) WorkSchedule.Done
    else if (q.isActive) WorkSchedule.Idle
    else q.exception match {
      case Some(e) => throw WorkerError.Restart(e) // teardown + re-bootstrap
      case None => WorkSchedule.Done // stopped cleanly
    }
  }

  override def execute(unit: Unit): Unit = ()

  override def teardown(): Unit = {
    val q = query
    if (q != null && q.isActive) q.stop()
  }
}

object StreamSupervisor {
  /** Launch + supervise: `start` is re-invoked on every restart (source
    * offsets/state recover from the query's checkpoint). */
  def spawn(name: String, policy: Policy = Policy())(start: () => StreamingQuery): Tether =
    StageRuntime.spawn(name, new StreamingWorker(start), policy)
}
