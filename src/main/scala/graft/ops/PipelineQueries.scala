package graft.ops

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import Q._

/** Queries expressed THROUGH the pipeline DSL, so gasket layer A is itself
  * exercised by the driver's correctness gate (not only by unit tests):
  * the declared stage graph must produce the same rows as the oracle SQL.
  */
object PipelineQueries {

  /** q01's aggregation, but built as source → filter stage → agg stage via
    * the DSL. Catalyst fuses the flows into the identical physical plan —
    * the DSL adds structure, not overhead. */
  val p01 = QueryDef(
    "p01_pipeline_agg",
    (s, d) => {
      Pipeline
        .from(Source[Row]("lineitem", sp => table(sp, d, "lineitem")))
        .via(Flow[Row, Row]("ship-filter",
          _.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))))
        .via(Flow[Row, Row]("flag-agg", df => df
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sumd(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("count_order"))))
        .dataFrame(s).asInstanceOf[DataFrame]
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${oSumd("l_quantity")} AS sum_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""))

  /** Funnel (fan-in) through the gate: union of two filtered order slices,
    * aggregated — UNION ALL multiset semantics match the SQL oracle. */
  val p02 = QueryDef(
    "p02_pipeline_funnel",
    (s, d) => {
      val urgent = Source[Row]("urgent",
        sp => table(sp, d, "orders").where(col("o_orderpriority") === "1-URGENT"))
      val high = Source[Row]("high",
        sp => table(sp, d, "orders").where(col("o_orderpriority") === "2-HIGH"))
      Pipeline.funnel("priority-funnel", urgent, high)
        .via(Flow[Row, Row]("by-status", df => df
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("sum_price"))))
        .dataFrame(s).asInstanceOf[DataFrame]
    },
    Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             ${oSumd("o_totalprice")} AS sum_price
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_orderstatus, o_orderpriority"""))

  val all: Seq[QueryDef] = Seq(p01, p02)
}
