package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import Q._

/** Training-shard export: the last step of a data pipeline — a
  * deterministic global shuffle of the curated corpus into N balanced
  * shards, each with a stable within-shard order, then a partitioned
  * parquet write (one directory per shard, rows in training order).
  *
  * Shuffling at 100 TB cannot use `rand()` (irreproducible) or a global
  * `ORDER BY` (one total sort of the corpus). Instead every document gets
  * a cryptographic sort key (`md5(doc_id:text)` — uniform, content-bound,
  * identical in Spark and DuckDB), the shard is a char-fold of that key,
  * and the training position is the rank of the key WITHIN its shard.
  * Ordering by a uniform hash IS the shuffle — and it is stable across
  * reruns, cluster sizes, and partition counts, which is what makes the
  * export auditable (the reference pins the same property for its
  * deterministic pipelines via seeded channels, `runtime.rs:143-178`).
  *
  * Scale shape: one shuffle, keyed on shard, carrying (shard, skey,
  * doc_id) — the text joins back in only inside [[writeShards]]'s final
  * write pass, so the gate query shuffles metadata-width rows. Per-shard
  * rank is a window over one shard = one external sort of corpus/N rows;
  * N is the dial (`-Dgraft.export.shards`) and grows with the corpus
  * (10⁴–10⁵ shards at 100 TB keeps each sort a few GB), so the window
  * never sees unbounded partitions. No driver-side collection anywhere.
  */
object ExportOps {

  /** Shard count (`-Dgraft.export.shards`) — JVM load-time constant like
    * `semdedup.centroids`, so engine SQL and oracle SQL can never
    * disagree within a run. */
  private[graft] val nShards =
    sys.props.getOrElse("graft.export.shards", "8").toInt

  private val sKey = "md5(concat(CAST(doc_id AS STRING), ':', text))"
  private val oKey = "md5(concat(CAST(doc_id AS VARCHAR), ':', text))"

  /** q56: the shard manifest — (doc_id, shard, pos) for every document.
    * `pos` is the document's deterministic training position within its
    * shard. One metadata-width shuffle + one per-shard sort. */
  val q56 = QueryDef(
    "q56_shard_export",
    (s, d) => withViews(s, d, "documents")(s"""
      WITH k AS (SELECT doc_id, $sKey AS skey FROM documents),
      b AS (SELECT doc_id, skey,
              CAST(char_fold(skey, 606) % $nShards AS BIGINT) AS shard
            FROM k)
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard
               ORDER BY skey, doc_id) AS BIGINT) AS pos
      FROM b"""),
    Some(s"""
      WITH k AS (SELECT doc_id, $oKey AS skey FROM documents),
      b AS (SELECT doc_id, skey,
              CAST(${oCharFold("skey", 606)} % $nShards AS BIGINT) AS shard
            FROM k)
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard
               ORDER BY skey, doc_id) AS BIGINT) AS pos
      FROM b"""))

  /** The physical export: write the corpus as `shard=<i>/` parquet
    * directories, rows inside each shard in training order. The manifest
    * columns ride along so a reader can audit order without re-hashing.
    *
    * `repartition(nShards, shard)` + `sortWithinPartitions` makes each
    * task own exactly one shard and sort it once (Spark's external sort —
    * spills, never OOMs); `partitionBy` then splits files by the constant
    * shard column. Text is carried through this single write pass only. */
  def writeShards(s: SparkSession, d: String, out: String): Unit = {
    import org.apache.spark.sql.functions.col
    q56.run(s, d).createOrReplaceTempView("x_manifest")
    val rows = withViews(s, d, "documents")("""
      SELECT m.shard, m.pos, m.doc_id, doc.text
      FROM x_manifest m JOIN documents doc ON m.doc_id = doc.doc_id""")
    rows
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
  }

  val all: Seq[QueryDef] = Seq(q56)
}
