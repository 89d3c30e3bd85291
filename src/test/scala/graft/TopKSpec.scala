package graft

import graft.plans.{TopK, TopKPerKeyExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // unique order values per key -> no tie ambiguity vs the window form
  private lazy val data = spark.range(0, 5000)
    .select(($"id" % 37).as("k"), ($"id" * 7919 % 100003).as("score"), $"id".as("payload"))

  test("TopK.perKey == window row_number form (k=3, desc)") {
    val got = TopK.perKey(data, Seq("k"), "score", 3)
      .select($"k", $"score", $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"k").orderBy($"score".desc)
    val want = data.withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select($"k", $"score", $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == 37 * 3)
  }

  test("ascending variant returns the k smallest per key") {
    val got = TopK.perKey(data, Seq("k"), "score", 1, descending = false)
      .groupBy($"k").agg(min($"score").as("s"))
    val want = data.groupBy($"k").agg(min($"score").as("s"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("physical plan uses TopKPerKeyExec with one hash exchange and NO sort") {
    val df = TopK.perKey(data, Seq("k"), "score", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val str = plan.toString
    assert(str.contains("TopKPerKey"), str)
    assert(!str.contains("Sort "), s"expected no sort operator:\n$str")
    assert(str.contains("hashpartitioning"), str)
    val _ = plan.collect { case e: TopKPerKeyExec => e }.nonEmpty
  }
}
