package graft.ops

import Q._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - s01: brute-force cosine top-k — the correctness baseline. Query set
  *    is a small filtered slice, so the "cross join" is |Q| × N with
  *    broadcastable |Q| — linear in N, parallel over N's partitions.
  *  - s02: LSH-bucketed variant — the 100 TB scale path. 4 deterministic
  *    hash-derived hyperplanes → 16 buckets; candidates come from an
  *    equality join on the bucket id, never a cross join. (Bucket count
  *    scales with the plane count; at real scale you'd use 16-24 planes
  *    and multi-probe. Recall vs s01 is approximate BY DESIGN; the oracle
  *    replicates the same planes so the result is still exact-checkable.)
  */
object SimilarityOps {

  /** Pseudo-random hyperplane component c(p, j) for plane p, dim j:
    * Knuth-hash of (p*64+j) → [-1.000, 1.000] in 0.001 steps. Exact
    * integer arithmetic + one division by 1000.0 on both engines. */
  private val planeS =
    "(CAST(((p*64 + j) * 2654435761) % 4294967296 % 2001 AS BIGINT) - 1000) / 1000.0"
  private val planeO =
    "(CAST(((p*64 + j) * 2654435761) % 4294967296 % 2001 AS BIGINT) - 1000) / 1000.0"

  val s01 = QueryDef(
    "s01_knn_bruteforce",
    (s, d) => {
      // Normalized vectors materialize once (consumed by the query side
      // and the corpus side); the tiny query side broadcasts, so the scan
      // over the corpus stays a single parallel pass — linear in N.
      val n = withViews(s, d, "embeddings")("""
        WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings)
        SELECT vec_id, v,
               sqrt(dot_product(v, v)) AS nrm
        FROM e""").cache()
      n.createOrReplaceTempView("s01_n")
      s.sql("""
        WITH q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM s01_n
              WHERE vec_id % 100 = 0),
        sc AS (SELECT /*+ BROADCAST(q) */ query_id, t.vec_id AS neighbor_id,
                 dot_product(qv, t.v) / (qn * t.nrm) AS cos
               FROM q JOIN s01_n t ON t.vec_id <> query_id),
        r AS (SELECT query_id, neighbor_id, cos,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
              FROM sc)
        SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= 5""")
    },
    Some("""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, v,
              sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
            FROM e),
      q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
            WHERE vec_id % 100 = 0),
      sc AS (SELECT query_id, t.vec_id AS neighbor_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(list_zip(qv, t.v), s -> s[1] * s[2])),
                 (acc, z) -> acc + z) / (qn * t.nrm) AS cos
             FROM q JOIN n t ON t.vec_id <> query_id),
      r AS (SELECT query_id, neighbor_id, cos,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rn
            FROM sc)
      SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
      FROM r WHERE rn <= 5"""),
    headline = true)

  val s02 = QueryDef(
    "s02_knn_lsh",
    (s, d) => {
      val n = withViews(s, d, "embeddings")(s"""
        WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings)
        SELECT vec_id, v,
               sqrt(dot_product(v, v)) AS nrm,
               aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, p) ->
                 acc + CASE WHEN aggregate(sequence(0, 63), CAST(0 AS DOUBLE),
                   (a, j) -> a + element_at(v, j+1) * $planeS) >= 0
                 THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END) AS bkt
        FROM e""").cache()
      n.createOrReplaceTempView("s02_n")
      s.sql("""
        WITH q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bkt AS qb FROM s02_n
              WHERE vec_id % 100 = 0),
        sc AS (SELECT /*+ BROADCAST(q) */ query_id, t.vec_id AS neighbor_id,
                 dot_product(qv, t.v) / (qn * t.nrm) AS cos
               FROM q JOIN s02_n t ON t.bkt = qb AND t.vec_id <> query_id),
        r AS (SELECT query_id, neighbor_id, cos,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
              FROM sc)
        SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= 5""")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, v,
              sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, 4), p ->
                  CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(0, 64), j -> v[j+1] * $planeO)),
                    (a, b) -> a + b) >= 0
                  THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)),
                (a, b) -> a + b) AS bkt
            FROM e),
      q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bkt AS qb FROM n
            WHERE vec_id % 100 = 0),
      sc AS (SELECT query_id, t.vec_id AS neighbor_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(list_zip(qv, t.v), s -> s[1] * s[2])),
                 (acc, z) -> acc + z) / (qn * t.nrm) AS cos
             FROM q JOIN n t ON t.bkt = qb AND t.vec_id <> query_id),
      r AS (SELECT query_id, neighbor_id, cos,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rn
            FROM sc)
      SELECT query_id, neighbor_id, cos, CAST(rn AS BIGINT) AS rn
      FROM r WHERE rn <= 5"""))

  val all: Seq[QueryDef] = Seq(s01, s02)
}
