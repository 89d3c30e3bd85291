package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers graft's native functions at
  * session build time, so a deployment can enable them cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) instead of calling
  * [[GraftFunctions.register]] per session. Same builders as the runtime
  * registration path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(e.injectFunction)
}

object GraftExtensions {
  private def lit(e: Expression): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: java.lang.Number, _) =>
      v.longValue()
    case other =>
      throw new IllegalArgumentException(s"expected literal argument, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("char_fold"),
      new ExpressionInfo(classOf[CharFold].getName, "char_fold"),
      (es: Seq[Expression]) => CharFold(es.head, lit(es(1)))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es.head, lit(es(1)).toInt)),
    (FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (es: Seq[Expression]) => ShingleSet(es.head, lit(es(1)).toInt)),
    (FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (es: Seq[Expression]) => JaccardSim(es.head, es(1))))
}
