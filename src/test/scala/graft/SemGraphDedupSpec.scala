package graft

import org.scalatest.funsuite.AnyFunSuite

/** d24 semantic graph dedup: partition-shape invariants (every vector
  * labeled exactly once, canonical = min id, exactly one survivor per
  * cluster), edge/component consistency against the s15 graph it is
  * built from, and the non-triviality audit (the prune actually fires
  * on the gate embeddings — a silently-empty edge set can't pass). */
class SemGraphDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val tau = graft.ops.DedupOps.semGraphTau.toDouble

  private lazy val out =
    SparkEntry.queries("d24_semantic_graph_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  private lazy val knn =
    SparkEntry.queries("s15_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(4)))

  private lazy val cluster = out.map(t => t._1 -> t._2).toMap

  test("every vector labeled exactly once; canonical is the cluster min") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.length == n, s"${out.length} rows for $n vectors")
    assert(out.map(_._1).distinct.length == out.length, "duplicate vec_id")
    for ((members) <- out.groupBy(_._2).values) {
      val ids = members.map(_._1)
      assert(members.head._2 == ids.min,
        s"cluster ${members.head._2} canonical is not min of ${ids.sorted.take(5).mkString(",")}")
      val survivors = members.filter(!_._3)
      assert(survivors.length == 1 && survivors.head._1 == ids.min,
        s"cluster ${members.head._2}: ${survivors.length} survivors")
    }
  }

  test("mutual >=tau edges never cross clusters; pruned vectors have a witness") {
    val semEdges = knn.filter(e => e._4 && e._3 >= tau)
    assert(semEdges.nonEmpty, "fixture yields no semantic edges")
    for ((a, b, c, _) <- semEdges)
      assert(cluster(a) == cluster(b),
        f"edge $a->$b (cos $c%.3f) crosses clusters ${cluster(a)} / ${cluster(b)}")
    // 1-hop witness: every pruned vector is on at least one semantic edge
    // (full reachability to the canonical is the fixpoint's contract,
    // gated by the recursive-CTE oracle; the spec pins the local fact)
    val touched = semEdges.flatMap(e => Seq(e._1, e._2)).toSet
    for ((id, _, pruned) <- out if pruned)
      assert(touched.contains(id), s"pruned $id has no semantic edge")
  }

  test("the prune fires and is not total (percolation guard)") {
    val pruned = out.count(_._3)
    info(s"d24 pruned $pruned of ${out.length} vectors at tau=$tau")
    assert(pruned > 0, "no vector pruned - edge set silently empty")
    // tau is chosen ABOVE the percolation point: one giant component
    // swallowing most of the corpus means the threshold stopped encoding
    // 'same semantic neighborhood' (measured at 0.30 on this data)
    val biggest = out.groupBy(_._2).values.map(_.length).max
    assert(biggest.toDouble / out.length < 0.25,
      s"largest cluster $biggest of ${out.length}: percolated")
    assert(pruned < out.length, "everything pruned")
  }
}
