package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native one-pass `corpus_features` expression bit-for-bit to
  * the SQL lambda/regex chain it replaces in q46/q50 (the chain the
  * DuckDB oracle still runs): same digest, same nine counters, per
  * document — over the real sf0.001 corpus AND adversarial edge rows the
  * corpus can't be trusted to contain. */
class CorpusFeaturesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val sNorm = graft.ops.Q.sNorm

  /** The literal q46/q50 SQL spelling, evaluated over view `docs(text)`. */
  private def sqlChain = s"""
    WITH t AS (SELECT id, $sNorm AS nt, split($sNorm, ' ') AS w FROM docs),
    b AS (SELECT id, nt, w,
            CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),
                   i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
                 ELSE CAST(array() AS ARRAY<STRING>) END AS bg
          FROM t)
    SELECT id, md5(nt) AS fp,
           CAST(size(w) AS BIGINT) AS n_tokens,
           aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + length(x)) AS total_chars,
           CAST(size(filter(w, x -> x IN ${graft.ops.TextOps.allStop})) AS BIGINT) AS n_stop,
           CAST(length(nt) AS BIGINT) AS n_chars,
           CAST(size(regexp_extract_all(nt, '[^a-z0-9 ]', 0)) AS BIGINT) AS n_sym,
           CAST(size(regexp_extract_all(nt, '[0-9]', 0)) AS BIGINT) AS n_digit,
           CAST(size(bg) AS BIGINT) AS n_bigrams,
           CAST(size(array_distinct(bg)) AS BIGINT) AS n_uniq_bigrams,
           CAST(size(array_distinct(w)) AS BIGINT) AS n_uniq_tokens,
           CAST(array_max(transform(array_distinct(w),
             x -> size(filter(w, y -> y = x)))) AS BIGINT) AS n_top_word
    FROM b"""

  private def nativeChain = """
    SELECT id, cf.fp AS fp, cf.n_tokens AS n_tokens,
           cf.total_chars AS total_chars, cf.n_stop AS n_stop,
           cf.n_chars AS n_chars, cf.n_sym AS n_sym, cf.n_digit AS n_digit,
           cf.n_bigrams AS n_bigrams, cf.n_uniq_bigrams AS n_uniq_bigrams,
           cf.n_uniq_tokens AS n_uniq_tokens, cf.n_top_word AS n_top_word
    FROM (SELECT id, corpus_features(text) AS cf FROM docs)"""

  private def compare(): Unit = {
    val want = spark.sql(sqlChain).collect().map(r => r.getLong(0) -> r).toMap
    val got = spark.sql(nativeChain).collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) assert(got(id) == w, s"doc $id: ${got(id)} != $w")
  }

  private def simhashSql = s"""
    WITH t AS (SELECT id, split($sNorm, ' ') AS w FROM docs),
    h AS (SELECT id, transform(w, x -> char_fold(x, 7)) AS hs FROM t)
    SELECT id,
           aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) ->
             acc + CASE WHEN aggregate(hs, CAST(0 AS BIGINT),
               (a, h) -> a + CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
             THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END) AS simhash
    FROM h"""

  private def assertSimhashParity(): Unit = {
    val want = spark.sql(simhashSql).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = spark.sql("SELECT id, simhash32(text) AS simhash FROM docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("corpus_features equals the SQL chain on the sf0.001 corpus") {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id AS id", "text")
      .createOrReplaceTempView("docs")
    compare()
    assertSimhashParity()
  }

  test("corpus_features equals the SQL chain on edge-case rows") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val edge = Seq(
      "",                      // empty → split gives [''], one empty token
      " ",                     // whitespace-only → trims to empty
      "\t\n  \r ",             // mixed whitespace-only
      "one",                   // single token: zero bigrams
      "the the the",           // all-stopword, all-duplicate bigrams
      "a b a b a b",           // duplicate bigrams both directions
      "ABC   DEF\tGhI",        // case folding + whitespace collapse
      "12 3.4 5,6 #7!",        // digits + symbols interleaved
      "café über straße", // non-ASCII letters count as symbols
      "ÉTÉ Été",     // non-ASCII case folding
      "emoji 😀 pair 😀", // supplementary code points
      "ctrlchar  end",      // control chars \s doesn't match
      "  padded   with   runs  ",
      "x " * 600 + "tail")     // >1000 tokens
    edge.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").createOrReplaceTempView("docs")
    compare()
    assertSimhashParity()
  }
}
