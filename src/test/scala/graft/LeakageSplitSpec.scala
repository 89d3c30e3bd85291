package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d26 leakage-safe split: near-duplicate pairs NEVER straddle splits
  * (the property doc-hash splitting violates — demonstrated on a planted
  * near-dup pair), assignment is the exact cluster-hash arithmetic, and
  * all three splits are populated with cluster-weighted fractions. */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plant(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-d26").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("planted near-dup pair shares a split even when doc-hash would separate it") {
    // ids 10 and 11: (10*2654435761)%2^32%10 = 4, (11*...)%2^32%10 = 5 -
    // a doc-id-hash split WOULD separate them; the cluster hash must not.
    val txt = (0 until 30).map(i => s"w$i").mkString(" ")
    val tmp = plant(Seq((10L, txt), (11L, txt),
      (12L, (0 until 30).map(i => s"z$i").mkString(" "))))
    val got = SparkEntry.queries("d26_leakage_safe_split")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(10L)._1 == 10L && got(11L)._1 == 10L, "pair not co-clustered")
    assert(got(10L)._2 == got(11L)._2, "near-dup pair straddles splits")
    assert(got(12L)._1 == 12L, "unique doc not a singleton cluster")
  }

  test("gate corpus: no d02 pair straddles; arithmetic exact; splits populated") {
    val dir = "/root/testdata/sf0.001"
    val split = SparkEntry.queries("d26_leakage_safe_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(split.size == n, "not every document assigned")
    for ((id, (cid, sp)) <- split) {
      val expect = (cid * 2654435761L) % 4294967296L % 10 match {
        case 0 => "val"; case 1 => "test"; case _ => "train"
      }
      assert(sp == expect, s"doc $id split $sp != $expect from cluster $cid")
    }
    val pairs = SparkEntry.queries("d02_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs)
      assert(split(a)._2 == split(b)._2, s"near-dup pair ($a,$b) straddles splits")
    val frac = split.values.groupBy(_._2).view.mapValues(_.size.toDouble / split.size).toMap
    info(s"d26 fractions at sf0.001: $frac")
    for (s <- Seq("train", "val", "test"))
      assert(frac.getOrElse(s, 0.0) > 0.02, s"split $s unpopulated: $frac")
    assert(frac("train") > 0.6, s"train fraction degenerate: $frac")
  }
}
