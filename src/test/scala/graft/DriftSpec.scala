package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q70 snapshot drift: hand-computed exact counts/imbalances on a planted
  * two-snapshot corpus (new / dropped / surging tokens, the whitespace-doc
  * exclusion), plus flag-consistency and the fired-but-not-degenerate
  * audit on the real gate corpus. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plant(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-q70").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("planted two-snapshot corpus: exact counts, imbalance, and flags") {
    // snapshot A = even doc_id, B = odd. NA=3 tokens, NB=6 tokens; the
    // all-whitespace doc 2 contributes nothing (t09's pinned exclusion).
    val tmp = plant(Seq(
      (0L, "stable stable oldtok"),
      (1L, "stable stable newtok surge surge surge"),
      (2L, "   ")))
    val got = SparkEntry.queries("q70_snapshot_drift")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(got.size == 4)
    // imbalance = |cnt_a*NB - cnt_b*NA| with NA=3, NB=6
    assert(got("stable") == ((2L, 2L, 6L, false, false, true)))
    assert(got("oldtok") == ((1L, 0L, 6L, false, true, true)))
    assert(got("newtok") == ((0L, 1L, 3L, true, false, true)))
    assert(got("surge") == ((0L, 3L, 9L, true, false, true)))
  }

  test("gate corpus: audit fires, flags are consistent, counts conserve") {
    val rows = SparkEntry.queries("q70_snapshot_drift")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate token row")
    val na = rows.map(_._2).sum
    val nb = rows.map(_._3).sum
    for ((tok, a, b, imb, isNew, isDropped, drifted) <- rows) {
      assert(isNew == (a == 0L) && isDropped == (b == 0L), s"flags wrong for $tok")
      assert(imb == math.abs(a * nb - b * na), s"imbalance wrong for $tok")
      assert(drifted == (imb * 1000 > graft.ops.CorpusOps.driftPermil * na * nb))
    }
    val drifted = rows.count(_._7)
    info(s"q70 drift at sf0.001: ${rows.length} tokens, $drifted drifted, NA=$na NB=$nb")
    assert(drifted > 0, "drift alarm never fires on the gate corpus")
  }
}
