package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4")
}

/** Smoke regression: every registered query runs at sf0.001 and each one
  * claiming an oracle produces deterministic, re-runnable output. Exact
  * value parity vs DuckDB is checked by tools/verify_local.py + driver. */
class QueriesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("registry names are unique and oracle keys ⊆ query keys") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle coverage: every query except the approximate ones has an oracle") {
    val noOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    // q23 is HLL-approximate by design; anything else missing an oracle is
    // a regression in the correctness gate
    assert(noOracle == Seq("q23_approx_distinct"), s"missing oracles: $noOracle")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q23 approximate distinct stays within HLL error bounds of exact") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q23_approx_distinct")(spark, dir)
      .select(col("l_returnflag"), col("approx_parts")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.ops.Q.table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05,
        s"flag $k: approx $a vs exact $n beyond 5% (rsd=0.01 configured)")
    }
  }

  test("scala UDF registration works (native expressions preferred on hot paths)") {
    import org.apache.spark.sql.functions.udf
    val clip = udf((x: Double, lo: Double, hi: Double) => math.max(lo, math.min(hi, x)))
    spark.udf.register("clip", clip)
    import spark.implicits._
    val r = Seq(-5.0, 0.5, 9.0).toDF("x")
      .selectExpr("clip(x, 0.0, 1.0) AS c").collect().map(_.getDouble(0)).toSeq
    assert(r == Seq(0.0, 0.5, 1.0))
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // materialize; non-empty is asserted only where guaranteed
    }
  }
}
