package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered engine query, in declaration order. */
  def registry: Seq[QueryDef] =
    graft.ops.Relational.all ++ graft.ops.Temporal.all ++
      graft.ops.TextOps.all ++ graft.ops.DedupOps.all ++
      graft.ops.SimilarityOps.all ++ graft.ops.MultimodalOps.all ++
      graft.ops.Extended.all ++ graft.ops.PipelineQueries.all ++
      graft.ops.TrainingPipeline.all ++ graft.ops.StreamingGate.all ++
      graft.ops.CorpusOps.all ++ graft.ops.CurationOps.all ++
      graft.ops.ExportOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the end-to-end training-data pipeline (quality → dedup → stats). */
  def entry(spark: SparkSession): DataFrame =
    graft.ops.TrainingPipeline.q40.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap

  /** Queries timed by [[Bench]] at sf0.1. */
  def headline: Seq[QueryDef] = registry.filter(_.headline)
}
