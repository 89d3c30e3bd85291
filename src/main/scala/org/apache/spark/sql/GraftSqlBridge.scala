package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface: building a DataFrame from a
  * custom LogicalPlan (the standard extension-library pattern — Spark has
  * no public constructor for this). Only used by graft.plans. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Drop the persisted blocks behind a (local)checkpointed Dataset.
    * A checkpointed Dataset's plan is a `LogicalRDD` over blocks that
    * nothing unpersists until the ContextCleaner notices the RDD is
    * unreachable — too late for iterative algorithms that supersede a
    * round per iteration. Only call this when the Dataset will never be
    * read again: localCheckpoint lineage is truncated, so lost blocks are
    * NOT recomputable. */
  def releaseCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
