package graft.examples

/** Dump formatted physical plans for the headline queries — the review
  * loop for scale hygiene: parquet pushdown (PushedFilters/ReadSchema),
  * broadcast vs sort-merge choices, WholeStageCodegen spans, AQE nodes.
  * Usage: runMain graft.examples.ExplainPlans [queryName ...]
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val targets =
      if (args.nonEmpty) graft.SparkEntry.registry.filter(q => args.contains(q.name))
      else graft.SparkEntry.headline
    targets.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.run(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
