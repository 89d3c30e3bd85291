package graft

/** Wall-clock measurement for the q58 streaming near-dup gate query at
  * ScaleData-scaled inputs (it cannot ride graft.Bench: the streaming job
  * runs during DataFrame CONSTRUCTION, so Bench would time only the final
  * sink read). Each run is a complete fresh pipeline — input staging
  * (parity-split file writes), two microbatches, state store, checkpoint,
  * parquet sink. Usage:
  *   sbt "Test/runMain graft.Q58Time /root/testdata/sf0.1 target/sfscaled64"
  */
object Q58Time {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val ops = Seq[(String, String => org.apache.spark.sql.DataFrame)](
      "q58" -> (d => graft.ops.StreamingGate.neardupStream(spark, d, None)),
      "m07" -> (d => graft.ops.MultimodalOps.perceptualStream(spark, d, None)),
      "s11" -> (d => graft.ops.StreamingGate.s11.run(spark, d)))
    for (d <- args; (name, run) <- ops) {
      run(d).count() // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = run(d).count()
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"$name $d: min ${times.map(_._1).min}%.2f s, hits ${times.head._2}")
    }
    spark.stop()
  }
}
