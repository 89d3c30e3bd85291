package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-pattern behaviors: salted skew joins produce identical results to
  * plain joins; bucketed tables join without a shuffle exchange. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join == plain join on skewed data (90% hot key)") {
    val skewed = spark.range(0, 10000)
      .select((when($"id" % 10 < 9, 1L).otherwise($"id")).as("k"),
        $"id".as("payload"))
    val dim = spark.range(0, 200).select($"id".as("k"), ($"id" * 2).as("attr"))

    val plain = skewed.join(dim, "k").select($"k", $"payload", $"attr")
    val salted = SaltedJoin(skewed, dim, "k", salts = 8)
      .select($"k", $"payload", $"attr")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = graft.ops.Q.table(spark, "/root/testdata/sf0.001", "orders")
    val customer = graft.ops.Q.table(spark, "/root/testdata/sf0.001", "customer")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // a previous JVM's managed-table dirs survive the (new) catalog's
    // DROP — remove the physical locations too
    val wh = java.nio.file.Paths.get(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("orders_b", "customer_b").foreach { t =>
      val p = wh.resolve(t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(joined.count() ==
      orders.join(customer, $"o_custkey" === $"c_custkey").count())
  }

  test("AQE coalesces shuffle partitions (adaptive enabled)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val df = graft.ops.Q.table(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy($"l_suppkey").agg(count(lit(1)))
    df.count()
    assert(df.queryExecution.executedPlan.toString.contains("AQEShuffleRead") ||
      df.rdd.getNumPartitions <= spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }
}
