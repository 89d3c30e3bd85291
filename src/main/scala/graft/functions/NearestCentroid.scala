package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The argmax assignment kernel shared by [[NearestCentroid]]'s
  * interpreted eval and its generated code (public so whole-stage-
  * generated Java in another package can hold and call it). Stateful:
  * centroid-table memo + vector scratch, task-local by construction. */
final class NearestCentroidKernel {
  private val table = new CentroidTable
  private var vecBuf: Array[Double] = _

  /** Returns `struct(cid, cos)` of the highest-cosine centroid (ties to
    * the smallest cid), or null when the centroid table is empty. */
  def eval(vecA: ArrayData, vn: Double, cs: ArrayData): InternalRow = {
    table.decode(cs)
    val dims = vecA.numElements()
    if (vecBuf == null || vecBuf.length < dims) vecBuf = new Array[Double](dims)
    var i = 0
    while (i < dims) { vecBuf(i) = vecA.getDouble(i); i += 1 }
    var bestCid = Long.MinValue
    var bestCos = Double.NegativeInfinity
    var first = true
    var c = 0
    val k = table.k
    while (c < k) {
      val cid = table.cids(c)
      val cv = table.cvs(c)
      var acc = 0.0
      i = 0
      while (i < dims) {
        acc += vecBuf(i) * cv(i)
        i += 1
      }
      val cos = acc / (vn * table.cns(c))
      // ORDER BY cos DESC, cid semantics (NaN sorts greatest, like Spark)
      val cmp =
        if (cos.isNaN && bestCos.isNaN) 0
        else if (cos.isNaN) 1
        else if (bestCos.isNaN) -1
        else java.lang.Double.compare(cos, bestCos)
      if (first || cmp > 0 || (cmp == 0 && cid < bestCid)) {
        bestCid = cid; bestCos = cos; first = false
      }
      c += 1
    }
    if (first) null else InternalRow(bestCid, bestCos)
  }
}

/** Per-row nearest-centroid assignment: given a vector, its L2 norm, and
  * the centroid table as ONE array value (`collect_list(named_struct(
  * 'cid', …, 'cv', …, 'cn', …))` over the seed set, cross-joined as a
  * single broadcast row), returns `struct(cid, cos)` of the
  * highest-cosine centroid, ties to the smallest cid — exactly the row
  * `row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) = 1`
  * selects.
  *
  * WHY: the window spelling EXPLODES each vector into k scored rows and
  * shuffles all N·k of them so one task can sort each vector's
  * candidates — the exchange grows with the centroid count, which is
  * exactly the dial that must grow with corpus size (cells stay O(100)
  * only if k ∝ N). This expression keeps assignment row-wise: one pass
  * over the scan, no row explosion, no shuffle — N·k work, O(N) rows.
  * Dots fold left-to-right like [[DotProduct]], so the selected cosine
  * is bit-identical to the SQL chain's.
  *
  * MEASURED CODEGEN REJECTION (round 15 — the same mechanism as
  * [[graft.functions.IntersectCount]]'s, caught by the quiet-bench
  * per-query diff): most consumers reference the struct result MORE
  * THAN ONCE (`nc.cid` + `nc.cos`, d17 adds `nc IS NOT NULL` — three
  * references), and CollapseProject substitutes the alias into every
  * field access, so a codegen'd spelling runs the N·k kernel fold 2-3×
  * per row inside the fused stage, while the `CodegenFallback` form
  * excludes the operator from whole-stage codegen and its standalone
  * projection evaluates the expression ONCE under subexpression
  * elimination. Quiet-bench sf0.1 deltas under the codegen'd spelling:
  * d24 +25%, s15 +24%, t19-class noise elsewhere; a targeted A/B
  * confirmed recovery on revert. The single-reference d16 shape
  * measured −5% under codegen — not worth the multi-reference tax.
  * Contrast [[NearestCentroids]] (plural): array result consumed once
  * via posexplode — its codegen ships (measured −9-10%). */
case class NearestCentroid(vec: Expression, nrm: Expression, cents: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = nrm
  override def third: Expression = cents

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))

  /** Explicitly nullable regardless of the children: an EMPTY centroid
    * array evaluates to null (d17's empty-eval-set guard relies on
    * `IS NOT NULL` surviving optimization) — inheriting nullability from
    * the children would let Catalyst fold that guard away whenever all
    * three inputs are non-nullable. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val okVec = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okNrm = nrm.dataType == DoubleType
    val okCents = cents.dataType match {
      case ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(DoubleType, _), _, _),
            StructField(_, DoubleType, _, _))), _) => true
      case _ => false
    }
    if (okVec && okNrm && okCents) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, double, " +
        "array<struct<cid:bigint,cv:array<double>,cn:double>>), got " +
        Seq(vec, nrm, cents).map(_.dataType.simpleString).mkString(", "))
  }

  override def prettyName: String = "nearest_centroid"

  @transient private lazy val kernel = new NearestCentroidKernel

  override protected def nullSafeEval(v: Any, n: Any, cs: Any): Any =
    kernel.eval(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      cs.asInstanceOf[ArrayData])


  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCentroid =
    copy(vec = newFirst, nrm = newSecond, cents = newThird)
}
