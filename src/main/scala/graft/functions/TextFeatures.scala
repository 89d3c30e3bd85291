package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Quality-scoring feature bundle in one JVM pass: normalized length,
  * token count, English-stopword hits, distinct-token count — exactly the
  * values of the SQL chain `norm → split → len/list_filter/list_distinct`
  * (same normalization as [[ShingleSet]]; stopword set fixed to the t03
  * oracle's list). One expression instead of four interpreted
  * higher-order-function evaluations per row. */
case class TextFeatures(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars_norm", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false)))

  override def prettyName: String = "text_features"

  private final val Stop = Set("the", "a", "of", "and", "to", "in", "is")

  override protected def nullSafeEval(input: Any): Any = {
    val norm = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
    val words = norm.split(" ", -1)
    var stop = 0
    val uniq = new java.util.HashSet[String](words.length * 2)
    var i = 0
    while (i < words.length) {
      if (Stop.contains(words(i))) stop += 1
      uniq.add(words(i))
      i += 1
    }
    // code POINTS, not UTF-16 units — SQL length() counts code points
    InternalRow(norm.codePointCount(0, norm.length).toLong,
      words.length.toLong, stop.toLong, uniq.size().toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): TextFeatures =
    copy(child = newChild)
}
