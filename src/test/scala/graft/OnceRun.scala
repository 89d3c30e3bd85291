package graft

/** Test-scope single-shot runner: execute one gate query's full plan once
  * (cold caches) and print wall time + output rows — for queries whose
  * scaled-data cost is minutes, where Bench's 6-run protocol is
  * impractical. */
object OnceRun {
  def main(args: Array[String]): Unit = {
    val (dir, names) = (args.head, args.tail.toSeq)
    val spark = Sessions.local()
    graft.functions.GraftFunctions.register(spark)
    for (name <- names) {
      val q = SparkEntry.registry.find(_.name == name).get
      graft.ops.Q.releaseAllPersisted(spark)
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).queryExecution.toRdd.count()
      println(f"[once] $name at $dir: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    }
    spark.stop()
  }
}
