package graft

/** Plan-inspection utility: for each named query, print the physical plan
  * as committed before execution (AQE initial) and as actually executed
  * (AQE final, after runtime re-planning) at the given data dir. The
  * 100-TB review loop is `Explain <dir> <query...>` → read the exchanges/
  * joins → fix → re-explain; keeping it a main makes that one sbt call.
  *
  * Usage: runMain graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local()
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name: initial plan =====")
      println(df.queryExecution.executedPlan.toString)
      df.count()
      println(s"===== $name: final plan (AQE) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
