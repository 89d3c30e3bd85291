package graft.examples

import graft.daemon.Daemon
import graft.pipeline._
import graft.runtime._
import scala.concurrent.duration._

/** End-to-end example in the spirit of the reference's
  * `gasket/examples/dumb.rs:196-237`: build a typed pipeline, run it
  * supervised under a policy, then inspect metrics — but Spark-first
  * (flows fuse into one codegen'd query instead of thread-per-stage).
  */
object PipelineExample {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    import spark.implicits._

    @volatile var out = Vector.empty[Long]
    val pipeline = Pipeline
      .from(Source[Long]("nums", s => s.range(1, 6).as[Long]))
      .via(Flow.map("square")((x: Long) => x * x))
      .via(Flow.mapOpt("odd-only")((x: Long) => if (x % 2 == 1) Some(x) else None))
      .to(SinkStage[Long]("collect", ds => out = ds.collect().toVector.sorted))

    val tether = pipeline.spawn(spark,
      Policy(workRetry = RetryPolicy(maxRetries = 2, backoffUnit = 10.millis)))
    new Daemon(Seq(tether), pollEvery = 20.millis).block()

    println(s"RESULT=${out.mkString(",")} phase=${tether.currentPhase}")
    print(PrometheusText.render("nums", tether.readMetrics()))
    spark.stop()
  }
}
