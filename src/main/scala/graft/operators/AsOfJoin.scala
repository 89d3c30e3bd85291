package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the latest right
  * row with `right.ts <= left.ts` within the same key (inclusive on ties).
  *
  * Spark has no built-in as-of join, so this composes built-ins
  * (preference (a) of the build rules): both sides are unioned, shuffled
  * ONCE on the key, sorted by (ts, side) inside each partition, and the
  * right payload is forward-filled with `last(_, ignoreNulls)` over an
  * unbounded-preceding row frame. Cost is one exchange + one sort over
  * |L|+|R| rows — linear and skew-tolerant (AQE can split hot keys),
  * unlike a naive range-join which is O(|L|·|R|) per key.
  */
object AsOfJoin {

  /** @param rightCols right-side payload columns to carry, each emitted as
    *                   `prefix + name` (left columns keep their names). */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      prefix: String = "right_"): DataFrame = {
    val leftCols = left.columns.toSeq

    val lPay = struct(leftCols.map(left(_)): _*)
    val rPay = struct(rightCols.map(right(_)): _*)
    val lType = left.select(lPay).schema.head.dataType
    val rType = right.select(rPay).schema.head.dataType

    val l = left.select(left(key).as("_k"), left(leftTime).as("_t"),
      lit(1).as("_side"), lPay.as("_l"), lit(null).cast(rType).as("_r"))
    // SQL join semantics: a NULL key/time on the right matches nothing
    // (window partitioning would otherwise group NULL keys together)
    val r = right
      .where(right(key).isNotNull && right(rightTime).isNotNull)
      .select(right(key).as("_k"), right(rightTime).as("_t"),
        lit(0).as("_side"), lit(null).cast(lType).as("_l"), rPay.as("_r"))

    // Right rows sort before left rows at equal timestamps => inclusive.
    // `_r` is the final sort key: among right rows tied on (key, ts) the
    // greatest payload (struct comparison over rightCols, in order) wins —
    // deterministic under any partitioning/shuffle order, where leaving
    // ties unordered would return whichever row the sort happened to place
    // last. (Payload columns must be orderable types — true for the
    // atomic/struct columns an as-of join carries.)
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val out: Seq[Column] =
      leftCols.map(c => col("_l").getField(c).as(c)) ++
        rightCols.map(c => col("_match").getField(c).as(prefix + c))
    filled.select(out: _*)
  }
}
