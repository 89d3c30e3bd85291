package graft

/** A/B evidence for q67's maintained-refresh claim, measuring the
  * MAINTAINED path ALONE — the number the gate row deliberately does not
  * produce (it computes merge AND full recompute to prove `matches_full`,
  * so its timing is the cost of its own proof, not of a refresh).
  *
  * Setup (untimed — the state a maintained materialized view owns): 15/16
  * of events pre-aggregated to hourly `(hour, event_type, n, decimal
  * sum)` state rows on parquet, and the remaining 1/16 as raw rows (the
  * ingest batch a refresh consumes). Timed, under Bench's protocol (toRdd
  * to completion, cold caches, min-of-N with adjacent warmup):
  *   - refresh: read state (metadata-width) + aggregate the delta + merge
  *     (counts add, decimal sums add — q67's exact-associativity
  *     argument);
  *   - full: re-aggregate every event row from the source table.
  * Prints one JSON line. Arg (optional): data dir (default sf0.1).
  */
object RefreshBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Sessions.local()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val D6 = graft.ops.Q.D6

    // registered for deletion at JVM exit (StreamingGate's scratch-dir rule)
    val tmp = graft.ops.StreamingGate.tempDir("q67refresh").toString
    val e = graft.ops.Q.events(spark, dir)
    e.where($"event_id" % 16 =!= 15)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast(D6)).as("s"))
      .write.mode("overwrite").parquet(s"$tmp/base_state")
    e.where($"event_id" % 16 === 15)
      .write.mode("overwrite").parquet(s"$tmp/delta")

    def cold(): Unit = { graft.ops.Q.releaseAllPersisted(spark); System.gc() }
    def timed(body: => Unit): Double = {
      cold()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def refresh(): Double = timed {
      val base = spark.read.parquet(s"$tmp/base_state")
      val delta = spark.read.parquet(s"$tmp/delta")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value".cast(D6)).as("s"))
      base.unionAll(delta)
        .groupBy($"hour", $"event_type")
        .agg(sum($"n").cast("bigint").as("n"),
          sum($"s").cast("double").as("sum_value"))
        .queryExecution.toRdd.count()
    }
    def full(): Double = timed {
      graft.ops.Q.events(spark, dir)
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).cast("bigint").as("n"),
          graft.ops.Q.sumd($"value").as("sum_value"))
        .queryExecution.toRdd.count()
    }

    val n = 5
    refresh(); full() // adjacent warmup
    val rs = Seq.fill(n)(refresh())
    val fs = Seq.fill(n)(full())
    def fmt(x: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(x))
    System.err.println(s"[refreshbench] refresh runs: ${rs.map(fmt)}")
    System.err.println(s"[refreshbench] full runs:    ${fs.map(fmt)}")
    println(s"""{"metric":"q67_refresh_ab","refresh":${fmt(rs.min)},"full":${fmt(fs.min)},"refresh_median":${fmt(rs.sorted.apply(n / 2))},"full_median":${fmt(fs.sorted.apply(n / 2))},"speedup":${fmt(fs.min / rs.min)},"sf":"$dir"}""")
    spark.stop()
  }
}
