package graft

import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation

import scala.collection.mutable

/** Test-scope plan auditor: for each gate query, walk the OPTIMIZED
  * logical plan (post cache substitution) WITHOUT descending into
  * InMemoryRelation (a cache builds once — its subtree is not live
  * recompute) and report
  *   (a) any source table whose FileScan appears ≥ 2 times live, and
  *   (b) any canonically-identical Generate subtree appearing ≥ 2 times
  *       live
  * — the two signatures of the multiply-referenced-subtree disease
  * (q61 round 11, d19 round 12, d02 round 12: a temp-view hop over a
  * cached Generate-bearing frame silently defeats CacheManager's
  * fragment match on Spark 4.1, so "cached" stages recompute per
  * reference). A clean report means every corpus-scale subtree in the
  * gate executes at most once per query.
  *
  * Usage: sbt "Test/runMain graft.PlanAudit <dataDir> [query...]"
  * (no query names = the full registry; queries that run jobs at plan
  * build time — streams, iterative loops — still audit their FINAL
  * frame's plan).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Sessions.local()
    graft.functions.GraftFunctions.register(spark)
    val names =
      if (args.tail.nonEmpty) args.tail.toSeq
      else SparkEntry.registry.map(_.name)
    var flagged = 0
    for (name <- names) {
      try {
        graft.ops.Q.releaseAllPersisted(spark)
        val df = SparkEntry.queries(name)(spark, dir)
        val live = mutable.ArrayBuffer[LogicalPlan]()
        def walk(p: LogicalPlan): Unit = p match {
          case _: InMemoryRelation => () // cache boundary: builds once
          case other =>
            live += other
            other.children.foreach(walk)
        }
        walk(df.queryExecution.optimizedPlan)
        val scanDups = live
          .collect { case lr: LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.getName).mkString(",")
              case other => other.toString.take(60)
            } }
          .groupBy(identity).view.mapValues(_.size).filter(_._2 > 1)
        val genDups = live
          .collect { case g: Generate => g.canonicalized.toString }
          .groupBy(identity).view.mapValues(_.size).filter(_._2 > 1)
        if (scanDups.nonEmpty || genDups.nonEmpty) {
          flagged += 1
          println(s"[audit] $name:")
          scanDups.foreach { case (s, n) =>
            println(s"[audit]   ${n}x live scan  $s") }
          genDups.foreach { case (g, n) =>
            println(s"[audit]   ${n}x live Generate  ${g.linesIterator.next().take(90)}") }
        } else println(s"[audit] $name: clean")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name: SKIP (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)})")
      }
    }
    println(s"[audit] done: $flagged flagged of ${names.size}")
    spark.stop()
  }
}
