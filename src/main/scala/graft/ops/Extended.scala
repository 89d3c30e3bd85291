package graft.ops

import org.apache.spark.sql.functions._
import Q._

/** Additional operator coverage: pivot, generators (explode), custom typed
  * aggregation — rounding out the SURVEY.md §2.2 inventory. */
object Extended {

  /** Pivot (dynamic columns fixed to the known status domain so the output
    * schema is deterministic); oracle is the equivalent conditional agg. */
  val q24 = QueryDef(
    "q24_pivot_status",
    (s, d) => {
      import s.implicits._
      table(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },
    Some("""
      SELECT o_orderpriority,
             cast(count(*) FILTER (WHERE o_orderstatus = 'F') as bigint) AS "F",
             cast(count(*) FILTER (WHERE o_orderstatus = 'O') as bigint) AS "O",
             cast(count(*) FILTER (WHERE o_orderstatus = 'P') as bigint) AS "P"
      FROM orders GROUP BY o_orderpriority"""))

  /** Generator/UDTF shape: explode the tokenized text into rows (the
    * impl_splitter! relational twin) and count word frequencies. */
  val q25 = QueryDef(
    "q25_word_frequencies",
    (s, d) => withViews(s, d, "documents")(s"""
      SELECT word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT explode(split($sNorm, ' ')) AS word FROM documents)
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 20"""),
    Some(s"""
      SELECT word, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split($oNorm, ' ')) AS word FROM documents) t
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 20"""))

  /** Custom typed Aggregator (fixed-point exact mean — associative across
    * partial-merge order, unlike a double sum). */
  val q26 = QueryDef(
    "q26_custom_aggregator",
    (s, d) => {
      import s.implicits._
      val exactMean = udaf(new graft.functions.ExactMean)
      table(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(exactMean($"l_quantity").as("mean_qty"),
          count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT l_returnflag, ${oAvgd("l_quantity")} AS mean_qty, count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  val all: Seq[QueryDef] = Seq(q24, q25, q26)
}
