package graft.ops

import org.apache.spark.sql.functions._

/** Flagship end-to-end training-data pipeline over `documents`:
  * quality-score → filter → near-dup cluster removal (MinHash+LSH →
  * connected components → keep cluster minimum) → per-language corpus
  * statistics. Composes t03, d02, d06 — each stage is itself
  * oracle-verified, and so is the composition. */
object TrainingPipeline {

  val q40 = QueryDef(
    "q40_training_pipeline",
    (s, d) => {
      import s.implicits._
      val quality = Q.staged("q40_quality", d) {
        TextOps.t03.run(s, d).select($"doc_id", $"n_tokens", $"quality")
      }
      val dupes = DedupOps.d06.run(s, d)
        .where($"is_duplicate").select($"doc_id".as("dup_id"))
      val docs = Q.table(s, d, "documents").select($"doc_id", $"lang")
      docs
        .join(quality, "doc_id")
        .where($"quality" >= 2)
        .join(dupes, $"doc_id" === $"dup_id", "left_anti")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          (sum($"n_tokens").cast("double") / count(lit(1))).as("mean_tokens"))
        .withColumn("total_tokens", $"total_tokens".cast("long"))
    },
    Some(s"""
      WITH q AS (${TextOps.t03.oracle.get.trim}),
      dup AS (
        SELECT doc_id FROM (${DedupOps.d06.oracle.get.trim}) WHERE is_duplicate
      ),
      kept AS (
        SELECT d.doc_id, d.lang, q.n_tokens
        FROM documents d
        JOIN q ON d.doc_id = q.doc_id
        WHERE q.quality >= 2
          AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc_id = d.doc_id)
      )
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             (CAST(sum(n_tokens) AS DOUBLE) / count(*)) AS mean_tokens
      FROM kept GROUP BY lang"""),
    headline = true)

  val all: Seq[QueryDef] = Seq(q40)
}
