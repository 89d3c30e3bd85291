package graft
/** One-off: dump the q69 edges-BUILD plan (the staged pre-pass PlanDump
  * cannot reach — the final q69 plan only shows its checkpointed leaf). */
object EdgesPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args
    val spark = Sessions.local()
    val df = graft.ops.CurationOps.pagerankEdges(spark, dir,
      graft.ops.CurationOps.pagerankCap)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
