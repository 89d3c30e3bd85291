package graft

/** A/B evidence for [[graft.ops.Temporal.fusedEventSuite]]: time the four
  * temporal gate queries separately (sum) vs the fused one-shuffle pass,
  * under Bench's honest protocol (toRdd to completion, cold staged caches
  * and persisted blocks per run, min-of-N with adjacent warmup). Prints
  * one JSON line. Arg (optional): data dir (default sf0.1).
  */
object FusedBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Sessions.local()
    val four = Seq("q60_conversion_funnel", "q61_cohort_retention",
      "q62_transition_matrix", "q63_interarrival_stats")
      .map(n => SparkEntry.registry.find(_.name == n).get)

    def cold(): Unit = { graft.ops.Q.releaseAllPersisted(spark); System.gc() }
    def runSum(): Double = {
      cold()
      val t0 = System.nanoTime()
      four.foreach(q => q.run(spark, dir).queryExecution.toRdd.count())
      (System.nanoTime() - t0) / 1e9
    }
    def runFused(): Double = {
      cold()
      val t0 = System.nanoTime()
      graft.ops.Temporal.fusedEventSuite(spark, dir)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    val n = 5
    runSum(); runFused() // adjacent warmup (JIT both generated code paths)
    val sums = Seq.fill(n)(runSum())
    val fused = Seq.fill(n)(runFused())
    def fmt(x: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(x))
    System.err.println(s"[fusedbench] sum runs:   ${sums.map(fmt)}")
    System.err.println(s"[fusedbench] fused runs: ${fused.map(fmt)}")
    println(s"""{"metric":"fused_event_suite","sum_of_four":${fmt(sums.min)},"fused":${fmt(fused.min)},"sum_median":${fmt(sums.sorted.apply(n / 2))},"fused_median":${fmt(fused.sorted.apply(n / 2))},"speedup":${fmt(sums.min / fused.min)},"sf":"$dir"}""")
    spark.stop()
  }
}
