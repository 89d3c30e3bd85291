package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (the `Aggregator[IN,BUF,OUT]` shape SURVEY.md
  * §2.2 assigns to user-defined aggregates): exact mean of a double column
  * via fixed-point accumulation.
  *
  * The sum accumulates as a scaled long (6 decimal places) — exact and
  * ASSOCIATIVE, so partial aggregation across any partitioning/merge order
  * yields identical results (a plain double sum would drift per merge
  * order on a cluster). `finish` renders the exact decimal to double and
  * divides once — matching the oracle's
  * `cast(sum(cast(x as decimal(18,6))) as double) / count(*)` bit-for-bit.
  */
class ExactMean extends Aggregator[Double, (Long, Long), Double] {
  private final val Scale = 1000000L

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), x: Double): (Long, Long) = {
    // round-half-up at 6dp, same as the SQL decimal(18,6) cast
    val scaled = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    (b._1 + scaled, b._2 + 1)
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN
    else new java.math.BigDecimal(
      java.math.BigInteger.valueOf(b._1), 6).doubleValue() / b._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
