package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (build-rule preference (c), spark_guide.md):
  * per-key top-k WITHOUT a per-partition full sort.
  *
  * Spark plans `row_number().over(partitionBy(key).orderBy(o)) <= k` as
  * exchange + FULL SORT of every partition — O(n log n) per partition and
  * materializes entire groups. This operator keeps a bounded k-element
  * heap per key: O(n log k), O(#keys · k) memory, no sort. At 100 TB
  * that's the difference between sorting every group and streaming over
  * them once.
  *
  * Pieces: [[TopKPerKeyPlan]] (logical) → [[TopKStrategy]] (planner) →
  * [[TopKPerKeyExec]] (physical, declares `ClusteredDistribution` so
  * EnsureRequirements inserts the single hash exchange). Registered via
  * `spark.experimental.extraStrategies` (or session extensions).
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (keysL, orderL, outL, kL) = (keys, order, child.output, k)
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keysL, outL)
      val better = new LazilyGeneratedOrdering(orderL, outL)
      // heap head = WORST retained row (reverse ordering) -> O(log k) evict
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kL + 1, better.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kL) heap.add(row.copy())
        else if (better.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top-k rows per key ordered by `orderCol` (row order within a key is
    * unspecified, like any unsorted relational result). */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      k: Int,
      descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${analyzed.output}"))
    val order = SortOrder(attr(orderCol), if (descending) Descending else Ascending)
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), Seq(order), k, analyzed))
  }
}
