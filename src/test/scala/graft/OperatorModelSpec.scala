package graft

import graft.operators.{AsOfJoin, RangeJoin}
import java.sql.Timestamp
import scala.concurrent.duration._
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized model checks for the custom join operators: the
  * distributed implementations must agree with brute-force in-memory
  * models on arbitrary keyed event sets (including ties and empty keys). */
final case class ModelEv(id: Long, user: Long, ts: Timestamp, value: Double)

class OperatorModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def genEvents(rng: Random, n: Int): Seq[ModelEv] =
    (0 until n).map { i =>
      ModelEv(i.toLong, rng.nextInt(4).toLong,
        new Timestamp(1700000000000L + rng.nextInt(1000) * 1000L),
        rng.nextInt(100).toDouble)
    }

  test("AsOfJoin agrees with the brute-force model (20 seeded cases)") {
    for (seed <- 0 until 20) {
      val rng = new Random(seed)
      val left = genEvents(rng, 30)
      val right = genEvents(rng, 30)
      val got = AsOfJoin(left.toDS().toDF(), right.toDS().toDF(),
        key = "user", leftTime = "ts", rightTime = "ts",
        rightCols = Seq("id"), prefix = "r_")
        .select($"id", $"r_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val want = left.map { l =>
        val cands = right.filter(r => r.user == l.user && !r.ts.after(l.ts))
        // inclusive ties: latest ts wins; equal (key, ts) right rows are
        // broken by the greatest payload struct — here payload = (id), so
        // the model's maxBy((ts, id)) is the exact contract
        val best = if (cands.isEmpty) -1L
          else cands.maxBy(r => (r.ts.getTime, r.id)).id
        (l.id, best)
      }.toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("AsOfJoin: equal (key, ts) right rows resolve deterministically (greatest payload)") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user", "ts")
    val dup = java.sql.Timestamp.valueOf("2024-01-01 09:30:00")
    // same (user, ts) three times with different payloads, in adversarial
    // insert order — every partitioning must pick rid=900 (the max)
    val rows = Seq((1L, dup, 900L), (1L, dup, 100L), (1L, dup, 500L))
    for (parts <- Seq(1, 3, 7)) {
      val right = spark.createDataFrame(rows).toDF("user", "ts", "rid")
        .repartition(parts)
      val out = AsOfJoin(left, right, "user", "ts", "ts", Seq("rid"))
        .select($"right_rid").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(900L), s"parts=$parts")
    }
  }

  test("AsOfJoin: NULL right keys/timestamps match nothing (SQL join semantics)") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user", "ts")
    val right = spark.sql("""
      SELECT * FROM VALUES
        (CAST(NULL AS BIGINT), TIMESTAMP '2024-01-01 09:00:00', 100L),
        (1L, CAST(NULL AS TIMESTAMP), 200L),
        (1L, TIMESTAMP '2024-01-01 09:30:00', 300L)
      AS t(user, ts, rid)""")
    val out = AsOfJoin(left, right, "user", "ts", "ts", Seq("rid"))
      .select($"right_rid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(300L))
  }

  test("RangeJoin agrees with the brute-force model (20 seeded cases)") {
    for (seed <- 100 until 120) {
      val rng = new Random(seed)
      val left = genEvents(rng, 25)
      val right = genEvents(rng, 25)
      val got = RangeJoin(left.toDS().toDF(), right.toDS().toDF(),
        key = "user", leftTime = "ts", rightTime = "ts",
        before = 120.seconds, after = 45.seconds,
        rightCols = Seq("id"), prefix = "r_")
        .select($"id", $"r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        l <- left
        r <- right
        if r.user == l.user
        if r.ts.getTime >= l.ts.getTime - 120000L
        if r.ts.getTime <= l.ts.getTime + 45000L
      } yield (l.id, r.id)).toSet
      assert(got == want, s"seed=$seed")
    }
  }
}
