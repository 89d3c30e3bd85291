package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-tolerant equi-join by key salting.
  *
  * When one join key carries a disproportionate share of rows, a plain
  * shuffle join puts the whole hot key in one task. AQE's skew-join split
  * handles sort-merge cases; explicit salting remains the portable fix
  * (and the only one when the skewed side feeds an aggregation next).
  *
  * The skewed (left) side gets a deterministic salt in [0, salts) hashed
  * from its entire row; the small/duplicable (right) side is replicated
  * `salts` times. The join key becomes (key, salt), spreading each hot key
  * over `salts` tasks. Result set is identical to the unsalted join.
  */
object SaltedJoin {

  def apply(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.filterNot(_ == key).toSeq

    val l = left.withColumn("_salt",
      pmod(hash(leftCols.map(left(_)): _*), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))

    l.join(r, l(key) === r(key) && l("_salt") === r("_salt"))
      .select(leftCols.map(l(_)) ++ rightCols.map(r(_)): _*)
  }
}
