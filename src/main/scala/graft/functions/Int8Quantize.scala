package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization of an embedding:
  * `struct(scale, qv, qd)` where `scale = max|x|/127`, `qv_i =
  * clamp±127(floor(x_i/scale + 0.5))` and `qd = Σ qv_i²` (exact long).
  *
  * Bit-identical to the SQL chain s07 executes (QuantizeSpec pins the
  * equivalence on real data):
  * {{{
  *   scale: array_max(transform(v, x -> abs(x))) / 127
  *   qv:    transform(v, x -> greatest(-127L, least(127L,
  *            CAST(floor(x / scale + 0.5d) AS BIGINT))))
  * }}}
  * — float→double widening is exact, abs/floor/divide are single IEEE
  * ops, the NaN conventions match Spark's (`array_max` treats NaN as
  * greatest; `CAST(NaN AS BIGINT)` is 0), and the clamp reproduces
  * `greatest(least(cast))` including the NaN case.
  *
  * WHY: the SQL spelling is 5 interpreted array walks with 4 intermediate
  * allocations per vector — fine for a one-time audit (s07), hot for an
  * index build (s08 quantizes the corpus before every search when the
  * code cache is cold). This is the same walk fused into one JVM loop. */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qv", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("qd", LongType, nullable = false)))

  override def prettyName: String = "int8_quantize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize wants array<float|double>, got $other")
    }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    def at(i: Int): Double = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    // pass 1: max |x| with array_max's NaN-greatest convention
    var mx = Double.NegativeInfinity
    var any = false
    var i = 0
    while (i < n) {
      val v = math.abs(at(i))
      if (!any || java.lang.Double.compare(v, mx) > 0) { mx = v; any = true }
      i += 1
    }
    val scale = if (any) mx / 127.0 else 0.0
    // pass 2: codes + exact integer self-dot
    val qv = new Array[Long](n)
    var qd = 0L
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val c = math.floor(at(i) / scale + 0.5)
        // greatest(-127, least(127, CAST(c AS BIGINT))) — NaN casts to 0
        val cl =
          if (c > 127.0) 127L
          else if (c < -127.0) -127L
          else if (java.lang.Double.isNaN(c)) 0L
          else c.toLong
        qv(i) = cl
        qd += cl * cl
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(qv), qd)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Exact integer dot product of two int8-code arrays (`array<bigint>`):
  * every |code| ≤ 127, so 64-dim sums stay far inside Long — and far
  * inside exact-double range, which is why `CAST(int8_dot(a,b) AS
  * DOUBLE)` is bit-identical to the oracle's double-accumulated fold
  * over the same codes. Length mismatch → NULL, like [[DotProduct]]. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}
