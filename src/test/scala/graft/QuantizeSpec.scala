package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the native [[graft.functions.Int8Quantize]] bit-identical to the
  * SQL quantization chain s07 executes (the oracle-mirrored spelling) on
  * real embeddings, and [[graft.functions.Int8Dot]] equal to the
  * double-fold dot over the same codes — so the fused fast path s08 uses
  * can never drift from the audited math. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("int8_quantize == the SQL chain (scale, codes, self-dot), per vector") {
    graft.functions.GraftFunctions.register(spark)
    graft.ops.Q.table(spark, dir, "embeddings")
      .createOrReplaceTempView("embeddings")
    val mism = spark.sql(s"""
      WITH ${graft.ops.SimilarityOps.sQuantCtes},
      sqlside AS (SELECT vec_id, scale, qv,
                    aggregate(transform(qv, c -> c * c),
                      CAST(0 AS BIGINT), (a, b) -> a + b) AS qd
                  FROM q),
      native AS (SELECT vec_id, n.q.scale AS scale, n.q.qv AS qv, n.q.qd AS qd
                 FROM (SELECT vec_id, int8_quantize(embedding) AS q
                       FROM embeddings) n)
      SELECT s.vec_id FROM sqlside s JOIN native v ON s.vec_id = v.vec_id
      WHERE s.scale <> v.scale OR s.qv <> v.qv OR s.qd <> v.qd""")
    assert(mism.isEmpty, s"native/SQL drift on: ${mism.collect().mkString(",")}")
  }

  test("int8_dot == double-fold dot over the same codes") {
    graft.functions.GraftFunctions.register(spark)
    graft.ops.Q.table(spark, dir, "embeddings")
      .createOrReplaceTempView("embeddings")
    val bad = spark.sql("""
      WITH n AS (SELECT vec_id, int8_quantize(embedding).qv AS qv
                 FROM embeddings WHERE vec_id < 50)
      SELECT a.vec_id, b.vec_id
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE CAST(int8_dot(a.qv, b.qv) AS DOUBLE) <>
            aggregate(zip_with(a.qv, b.qv,
                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0 AS DOUBLE), (acc, z) -> acc + z)""")
    assert(bad.isEmpty)
  }
}
