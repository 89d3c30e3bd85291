package graft

/** Test-scope micro-probe: times per-doc analysis expressions of q46/q50
  * over a data dir, to attribute the corpus-scan cost.
  *
  * METHODOLOGY: every probe is `SELECT sum(...)` evaluated via
  * `collect()`. Timing `df.count()` instead is a trap — Catalyst prunes
  * the projection under a count (count(1) needs no columns), so the
  * measured expression never runs and every row reads ~0.15 s regardless
  * of cost (this probe's first version made exactly that mistake and
  * mis-attributed a 10 s stage).
  *
  * Usage: sbt "Test/runMain graft.ExprProbe <dataDir>"
  */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sfscaled8")
    val spark = Sessions.local()
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")
    val nrm = graft.ops.Q.sNorm
    def time(name: String, sql: String): Unit = {
      val df = spark.sql(sql)
      df.collect() // warm
      val t0 = System.nanoTime(); df.collect()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    time("normalize", s"SELECT sum(length($nrm)) FROM documents")
    time("split+size", s"SELECT sum(size(split($nrm, ' '))) FROM documents")
    time("md5", s"SELECT sum(length(md5($nrm))) FROM documents")
    time("regex n_sym",
      s"SELECT sum(size(regexp_extract_all($nrm, '[^a-z0-9 ]', 0))) FROM documents")
    time("regex n_digit",
      s"SELECT sum(size(regexp_extract_all($nrm, '[0-9]', 0))) FROM documents")
    time("stopword filter", s"""SELECT sum(size(filter(split($nrm, ' '),
      x -> x IN ${graft.ops.TextOps.allStop}))) FROM documents""")
    time("total_chars fold", s"""SELECT sum(aggregate(split($nrm, ' '),
      CAST(0 AS BIGINT), (a, x) -> a + length(x))) FROM documents""")
    time("bigrams+distinct", s"""
      WITH t AS (SELECT split($nrm, ' ') AS w FROM documents),
      b AS (SELECT CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),
              i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
            ELSE CAST(array() AS ARRAY<STRING>) END AS bg FROM t)
      SELECT sum(size(array_distinct(bg))) FROM b""")
    // the full q46/q50 SQL analysis chain (the oracle spelling) ...
    time("SQL chain (all features)", s"""
      WITH t AS (SELECT doc_id, lang, $nrm AS nt, split($nrm, ' ') AS w FROM documents),
      b AS (SELECT doc_id, lang, nt, w,
              CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),
                     i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
                   ELSE CAST(array() AS ARRAY<STRING>) END AS bg
            FROM t),
      f AS (SELECT doc_id, lang, md5(nt) AS fp,
              CAST(size(w) AS BIGINT) AS n_tokens,
              aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + length(x)) AS total_chars,
              CAST(size(filter(w, x -> x IN ${graft.ops.TextOps.allStop})) AS BIGINT) AS n_stop,
              CAST(length(nt) AS BIGINT) AS n_chars,
              CAST(size(regexp_extract_all(nt, '[^a-z0-9 ]', 0)) AS BIGINT) AS n_sym,
              CAST(size(regexp_extract_all(nt, '[0-9]', 0)) AS BIGINT) AS n_digit,
              CAST(size(bg) AS BIGINT) AS n_bigrams,
              CAST(size(array_distinct(bg)) AS BIGINT) AS n_uniq_bigrams
            FROM b)
      SELECT sum(n_tokens + n_sym + n_stop + total_chars + n_bigrams
                 + n_uniq_bigrams + n_chars + n_digit + length(fp)) FROM f""")
    // ... vs the native one-pass expression that replaced it in-engine
    time("corpus_features (native)", s"""
      WITH c AS (SELECT corpus_features(text) AS cf FROM documents)
      SELECT sum(cf.n_tokens + cf.n_sym + cf.n_stop + cf.total_chars
                 + cf.n_bigrams + cf.n_uniq_bigrams + cf.n_chars
                 + cf.n_digit + length(cf.fp)) FROM c""")
    spark.stop()
  }
}
