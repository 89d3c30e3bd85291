package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double arrays with a strict left-to-right
  * accumulation — bit-identical to the SQL fold
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,z) -> acc+z)` and to
  * DuckDB's `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b),
  * s -> s[1]*s[2])), +)`, but a plain JVM loop instead of interpreted
  * per-element lambdas (the hot inner loop of similarity search).
  * Norms come free: `sqrt(dot_product(v, v))`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // length mismatch => NULL, matching the zip_with/list_zip SQL forms
    // (they pad with NULL, which nulls the whole fold) — a malformed
    // vector surfaces instead of producing a plausible partial sum
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
