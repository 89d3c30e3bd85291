package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds an N×-scaled copy of a driver SF directory for scale
  * experiments: fact tables (orders, lineitem) are replicated with
  * shifted order keys — each replica is a disjoint key range, so join
  * fan-outs and group cardinalities grow linearly like real data, not
  * like naive row duplication (which would multiply rows-per-key and
  * skew every aggregate) — and all other tables are copied through.
  *
  * This substantiates the fixed-overhead claim for the small TPC-H
  * queries: Spark's ~0.2-1 s per-job constant (scheduling + exchange
  * setup) dominates at sf0.1 where the actual work is 60-90 ms; at N×
  * the data the constant amortizes and the DuckDB ratio collapses.
  *
  * Usage: runMain graft.ScaleData <baseSfDir> <outDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val (baseDir, outDir, factorS) = (args(0), args(1), args(2))
    // Replicated embeddings are perturbed by a per-replica epsilon on
    // dim 0 (+0.001·i). Round-14 finding: verbatim vector replication
    // caps the DISTINCT-vector count at the base corpus size, so a
    // trained quantizer collapses to ≤|base|/stride distinct seeds NO
    // MATTER K (measured: K=640 at 16× yields 16 effective cells — the
    // K∝N dial cannot be exercised at all). The salt keeps neighbor
    // structure (epsilon ≪ any cosine gap) while restoring seed
    // diversity — the embedding-space twin of the text " rN" salt.
    // DEFAULT ON since round 15 (r14 verdict item 1a: the linear-regime
    // curve must be reproducible from the repo, and the auto-select
    // trained quantizer is now the default path at scale — an unsalted
    // dir would exercise the harness artifact, not the engine). Pass
    // "noSaltVecs" as the 4th arg to reproduce pre-r15 byte-identical
    // dirs; "saltVecs" is still accepted as an explicit no-op. Any OTHER
    // 4th arg fails loudly: the old permissive parse treated a typo
    // ("nosaltvecs", "noSalt") as salt-ON, silently producing a
    // non-byte-identical dir while the operator believed they reproduced
    // the pre-r15 layout.
    val saltVecs = args.length match {
      case n if n <= 3 => true
      case _ => args(3) match {
        case "saltVecs"   => true
        case "noSaltVecs" => false
        case other => sys.error(
          s"ScaleData: unknown 4th arg '$other' — expected 'saltVecs' or 'noSaltVecs'")
      }
    }
    val factor = factorS.toInt
    val spark = Sessions.local()

    def read(t: String): DataFrame = spark.read.parquet(s"$baseDir/$t.parquet")

    val keyStride = read("orders").agg(max(col("o_orderkey"))).head().getLong(0) + 1L

    /** Union `factor` copies with the key column shifted per replica. */
    def replicate(df: DataFrame, keyCol: String): DataFrame =
      (0 until factor).map { i =>
        df.withColumn(keyCol, col(keyCol) + lit(i * keyStride))
      }.reduce(_ unionByName _)

    // documents replicate with shifted ids AND a per-replica salt token on
    // the text: naive copies would give every doc factor-1 exact clones,
    // inflating dedup hit rates far beyond real corpora — the salt keeps
    // per-replica dup structure identical to the base corpus while sizes
    // grow linearly (one extra token per doc).
    val docStride =
      read("documents").agg(max(col("doc_id"))).head().getLong(0) + 1L
    def replicateDocs(df: DataFrame): DataFrame =
      (0 until factor).map { i =>
        val shifted = df.withColumn("doc_id", col("doc_id") + lit(i * docStride))
        if (i == 0) shifted
        else shifted.withColumn("text", concat(col("text"), lit(s" r$i")))
      }.reduce(_ unionByName _)

    // embeddings replicate with shifted vec_ids (vectors repeat verbatim:
    // ANN/k-means cost is driven by row count and the deterministic
    // seed/bucket structure, both of which scale correctly with the id)
    val vecStride =
      read("embeddings").agg(max(col("vec_id"))).head().getLong(0) + 1L
    def replicateVecs(df: DataFrame): DataFrame =
      (0 until factor).map { i =>
        val shifted = df.withColumn("vec_id", col("vec_id") + lit(i * vecStride))
        if (i == 0 || !saltVecs) shifted
        else shifted.withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> IF(j = 0, CAST(x + $i * 0.001 AS FLOAT), x))"))
      }.reduce(_ unionByName _)

    val out: Seq[(String, DataFrame)] = Seq(
      "orders" -> replicate(read("orders"), "o_orderkey"),
      "lineitem" -> replicate(read("lineitem"), "l_orderkey"),
      "documents" -> replicateDocs(read("documents")),
      "embeddings" -> replicateVecs(read("embeddings")),
      // events replicate with shifted user_id AND event_id: each replica
      // is a disjoint population of users with identical per-user
      // timelines, so the sessionization / as-of / range-join structure
      // (all keyed or blocked by user_id) grows linearly — new users,
      // not denser histories. Read through Q.events' ns→µs normalization
      // (a raw copy would re-write the TIMESTAMP(NANOS) column as BIGINT
      // — this session reads nanos as long — breaking every oracle that
      // does `cast(ts as timestamp)` on the scaled dir).
      "events" -> {
        val ev = graft.ops.Q.events(spark, baseDir)
        val userStride = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
        val evStride = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
        (0 until factor).map { i =>
          ev.withColumn("user_id", col("user_id") + lit(i * userStride))
            .withColumn("event_id", col("event_id") + lit(i * evStride))
        }.reduce(_ unionByName _)
      }) ++
      Seq("region", "nation", "customer", "supplier", "part")
        .map(t => t -> read(t))

    out.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      System.err.println(s"[scale] wrote $t")
    }
    spark.stop()
  }
}
