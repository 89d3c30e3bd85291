package graft

/** Temporary experiment harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sfscaled64")
    val spark = Sessions.local()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        graft.ops.Q.releaseAllPersisted(spark)
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-34s min=${ts.min}%.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    import graft.ops.Q.{sNorm, withViews}
    import org.apache.spark.scheduler._
    import scala.collection.mutable
    val stages = mutable.Map[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages(si.stageId) = (ms, si.numTasks.toLong)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def q46 = graft.SparkEntry.queries("q46_corpus_report")(spark, dir)
    def q50 = graft.SparkEntry.queries("q50_sequence_pipeline")(spark, dir)
    time("q46 full") { q46.count() }
    time("q50 full") { q50.count() }
    locally {
      val a = q46
      a.count()
      println("===== q46 executed =====")
      println(a.queryExecution.executedPlan.toString.split("\n").take(6).mkString("\n"))
      graft.ops.Q.releaseAllPersisted(spark)
      val b = q50
      b.count()
      println("===== q50 executed =====")
      println(b.queryExecution.executedPlan.toString.split("\n").take(6).mkString("\n"))
      println("===== end =====")
    }
    spark.stop()
  }
}
