package graft.streaming

import graft.pipeline.Flow
import graft.runtime.{Policy, Tether}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** The pipeline DSL over unbounded flows: the same [[Flow]] combinators
  * compose onto a streaming DataFrame (Structured Streaming transforms are
  * ordinary Dataset transforms), and the terminal spawns the query under
  * the graft stage runtime — gasket's supervised unbounded stage, with
  * restart-on-failure from [[StreamSupervisor]]. */
object StreamPipeline {

  /** @param openThrottled capacity-aware open for bounded-channel edges
    *                       (`messaging.rs:384-391`): receives the pipeline's
    *                       resolved per-edge capacity (rows per micro-batch)
    *                       and must map it to the source's admission knob
    *                       (`maxFilesPerTrigger` / `maxOffsetsPerTrigger` /
    *                       graft-gen `rowsPerBatch`). */
  final case class StreamSource(
      name: String,
      open: SparkSession => DataFrame,
      openThrottled: Option[(SparkSession, Long) => DataFrame] = None)

  object StreamSource {
    import scala.concurrent.duration._

    /** Processing-time tick source — the reference's `TimerPort`
      * (`/root/reference/gasket/src/messaging.rs:151-209`) as a
      * first-class DSL source. Emits one `(tick, ts)` row per `interval`:
      * `tick` the 0-based ordinal, `ts` the tick's timestamp. The rate
      * source stamps rows on a fixed `interval` grid, so the pacing is
      * exactly assertable (the reference's own `test_timer_port` is
      * `#[ignore]`d and asserts nothing). Lifecycle matches TimerPort:
      * the ticker starts lazily with the query (`RunningTimer::start` on
      * first recv) and stops with the pipeline tether's `dismiss()`
      * (`TimerPort::stop`). At scale a tick stream is metadata-width by
      * construction; its only cost is the micro-batch cadence. */
    def timer(interval: FiniteDuration): StreamSource = {
      val ms = interval.toMillis
      require(ms >= 1, s"timer interval must be >= 1ms: $interval")
      require(1000 % ms == 0 || ms % 1000 == 0,
        s"timer interval must divide one second or be a whole-second " +
          s"multiple (the rate-source grid): $interval")
      StreamSource(s"timer($interval)", open = { s =>
        import org.apache.spark.sql.functions._
        if (ms <= 1000)
          s.readStream.format("rate")
            .option("rowsPerSecond", (1000 / ms).toString).load()
            .select(col("value").as("tick"), col("timestamp").as("ts"))
        else {
          // whole-second intervals: tick the 1 Hz grid, keep every n-th
          val n = ms / 1000
          s.readStream.format("rate").option("rowsPerSecond", "1").load()
            .where(col("value") % n === 0)
            .select((col("value") / n).cast("long").as("tick"),
              col("timestamp").as("ts"))
        }
      })
    }
  }

  def from(source: StreamSource): StreamBuilder =
    new StreamBuilder(source.name, (s, cap) => cap match {
      case Some(c) => source.openThrottled match {
        case Some(f) => f(s, c)
        case None => throw new IllegalStateException(
          s"stream pipeline '${source.name}': an edge declares capacity $c " +
            "but the source exposes no admission control — give the " +
            "StreamSource an openThrottled variant")
      }
      case None => source.open(s)
    })

  final class StreamBuilder private[streaming] (
      val name: String,
      build: (SparkSession, Option[Long]) => DataFrame,
      capacity: Option[Long] = None,
      provider: Option[String] = None) {

    def via(flow: Flow[Row, Row]): StreamBuilder =
      new StreamBuilder(s"$name->${flow.name}",
        (s, c) => flow.apply(build(s, c)).toDF(), capacity, provider)

    /** Capacity-bounded edge — the reference's channels carry an explicit
      * per-edge capacity (`messaging.rs:384-391`). Fused flows form ONE
      * streaming query, so the chain's in-flight bound is the MINIMUM of
      * its edges' capacities, applied as source admission control: each
      * micro-batch holds at most that many rows at the stage boundary. */
    def via(flow: Flow[Row, Row], edgeCapacity: Long): StreamBuilder = {
      require(edgeCapacity > 0, s"edge capacity must be positive: $edgeCapacity")
      new StreamBuilder(s"$name->${flow.name}",
        (s, c) => flow.apply(build(s, c)).toDF(),
        Some(capacity.fold(edgeCapacity)(math.min(_, edgeCapacity))), provider)
    }

    /** Per-pipeline state-store provider (see [[StateStores]]): stateful
      * operators in THIS pipeline keep their state under `providerClass`
      * (e.g. [[StateStores.RocksDB]] to spill unbounded dedup/join state
      * to disk) without changing the session default. */
    def stateStore(providerClass: String): StreamBuilder =
      new StreamBuilder(name, build, capacity, Some(providerClass))

    /** Supervised terminal: `sink` configures the writer (format, mode,
      * checkpoint); the query runs under the stage runtime and restarts
      * with the policy's bootstrap backoff on failure. The state-store
      * provider conf is scoped around each (re)start — a restarted query
      * re-reads it, so supervision keeps the pipeline's choice. */
    def spawn(spark: SparkSession, policy: Policy = Policy())(
        sink: DataStreamWriter[Row] => StreamingQuery): Tether =
      StreamSupervisor.spawn(name, policy) { () =>
        StateStores.withProvider(spark, provider) {
          sink(build(spark, capacity).writeStream)
        }
      }
  }
}
