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

  final case class StreamSource(name: String, open: SparkSession => DataFrame)

  def from(source: StreamSource): StreamBuilder =
    new StreamBuilder(source.name, source.open)

  final class StreamBuilder private[streaming] (
      val name: String,
      build: SparkSession => DataFrame) {

    def via(flow: Flow[Row, Row]): StreamBuilder =
      new StreamBuilder(s"$name->${flow.name}", s => flow.apply(build(s)).toDF())

    /** Supervised terminal: `sink` configures the writer (format, mode,
      * checkpoint); the query runs under the stage runtime and restarts
      * with the policy's bootstrap backoff on failure. */
    def spawn(spark: SparkSession, policy: Policy = Policy())(
        sink: DataStreamWriter[Row] => StreamingQuery): Tether =
      StreamSupervisor.spawn(name, policy) { () =>
        sink(build(spark).writeStream)
      }
  }
}
