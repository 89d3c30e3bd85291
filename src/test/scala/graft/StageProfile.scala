package graft

import org.apache.spark.scheduler._

import scala.collection.mutable

/** Test-scope profiling harness (NOT part of the library jar): runs named
  * gate queries cold and prints per-stage wall time, task counts, and
  * shuffle read/write volumes — the evidence for "the residual cost is the
  * exchange itself" claims in SCALE.md.
  *
  * Usage: sbt "Test/runMain graft.StageProfile <dataDir> <query> [query…]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = Sessions.local()
    final case class St(name: String, ms: Long, tasks: Int,
        shufWriteMB: Double, shufReadMB: Double, shufWriteRec: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += St(
          si.name.takeWhile(_ != '\n').take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.recordsWritten)
      }
    })
    for (name <- names) {
      val q = SparkEntry.queries(name)
      // full execution of the query's own plan (count() would let the
      // optimizer prune the payload — see Bench.exec)
      def exec(): Unit = q(spark, dir).queryExecution.toRdd.count()
      // warm once (JIT), then profile a cold-cache run
      graft.ops.Q.releaseAllPersisted(spark); exec()
      graft.ops.Q.releaseAllPersisted(spark); System.gc()
      stages.clear()
      val t0 = System.nanoTime()
      exec()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"==== $name: $total%.2f s total ====")
      println(f"${"stage"}%-62s ${"ms"}%7s ${"tasks"}%5s ${"shW-MB"}%8s ${"shR-MB"}%8s ${"shW-rec"}%9s")
      stages.sortBy(-_.ms).foreach { s =>
        println(f"${s.name}%-62s ${s.ms}%7d ${s.tasks}%5d ${s.shufWriteMB}%8.1f ${s.shufReadMB}%8.1f ${s.shufWriteRec}%9d")
      }
      val sumMs = stages.map(_.ms).sum
      println(f"(stage wall-time sum: ${sumMs / 1000.0}%.2f s across ${stages.size} stages; " +
        "stages overlap, so the sum can exceed wall time)\n")
    }
    spark.stop()
  }
}
