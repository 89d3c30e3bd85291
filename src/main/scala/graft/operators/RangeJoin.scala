package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.concurrent.duration._

/** Keyed interval join: pairs (l, r) with the same key and
  * `r.ts ∈ [l.ts - before, l.ts + after]` (inclusive).
  *
  * Spark plans a naive time-range predicate as a broadcast-nested-loop /
  * cartesian per key — O(|L|·|R|) and a non-starter at scale. This
  * implementation BUCKETS time into `before + after`-wide bins: the right
  * side lands in one bucket, the left side explodes to the (at most
  * ceil((before+after)/w)+1 = 2) buckets its window covers, and the join
  * becomes an equi-join on (key, bucket) + an exact residual filter.
  * Cost: one shuffle of |L|·2 + |R| rows, skew handled by AQE.
  */
object RangeJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      before: FiniteDuration,
      after: FiniteDuration = Duration.Zero,
      rightCols: Seq[String] = Seq.empty,
      prefix: String = "right_"): DataFrame = {
    val beforeUs = before.toMicros
    val afterUs = after.toMicros
    require(beforeUs + afterUs > 0, "range join window must be non-empty")
    val w = beforeUs + afterUs

    val leftCols = left.columns.toSeq
    val rCarry = if (rightCols.nonEmpty) rightCols else right.columns.toSeq

    val l = left
      .withColumn("_lts", unix_micros(col(leftTime)))
      .withColumn("_bkt", explode(sequence(
        floor((col("_lts") - lit(beforeUs)) / lit(w)).cast("long"),
        floor((col("_lts") + lit(afterUs)) / lit(w)).cast("long"))))
    val r = right
      .select(col(key).as("_rk") +: col(rightTime).as("_rt") +:
        rCarry.map(c => right(c).as(prefix + c)): _*)
      .withColumn("_rts", unix_micros(col("_rt")))
      .withColumn("_bkt", floor(col("_rts") / lit(w)).cast("long"))

    val joined = l.join(r,
      l(key) === r("_rk") && l("_bkt") === r("_bkt") &&
        r("_rts") >= l("_lts") - lit(beforeUs) &&
        r("_rts") <= l("_lts") + lit(afterUs))

    val out: Seq[Column] =
      leftCols.map(joined(_)) ++ rCarry.map(c => joined(prefix + c))
    joined.select(out: _*)
  }
}
