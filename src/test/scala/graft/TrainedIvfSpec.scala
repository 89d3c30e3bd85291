package graft

import org.scalatest.funsuite.AnyFunSuite

/** s17 trained-quantizer IVF: adjacency-shape invariants, and the honest
  * side-by-side recall audit — the trained (k-means) quantizer at P=2
  * probes vs s03's sampled quantizer at P=4, both against driver-side
  * brute-force truth. The comparison (not just the floor) is the
  * committed evidence for whether index training pays on this corpus
  * geometry. */
class TrainedIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val got =
    SparkEntry.queries("s17_knn_ivf_trained")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("shape: bounded per-query lists, dense ranks, ordered cos, no self") {
    assert(got.nonEmpty)
    for ((q, es) <- got.groupBy(_._1)) {
      assert(es.length <= 5)
      assert(es.forall(_._2 != q), s"query $q self-match")
      val ranked = es.sortBy(_._4)
      assert(ranked.map(_._4).sameElements(1L to es.length.toLong))
      for (Array(a, b) <- ranked.sliding(2).map(_.toArray))
        assert(a._3 >= b._3, s"query $q cos not sorted")
    }
  }

  test("recall vs brute force, side by side with the sampled quantizer") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map { r =>
        r.getLong(r.fieldIndex("vec_id")) ->
          r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
      }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = got.map(_._1).distinct
    val truth = queries.map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (j, w) => (j, cos(vecs(q), w)) }
        .sortBy { case (j, c) => (-c, j) }.take(5).map(_._1).toSet
    }.toMap
    def recall(rows: Array[(Long, Long)]): Double = {
      val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      queries.map(q => byQ.getOrElse(q, Set.empty[Long])
        .intersect(truth(q)).size.toDouble / 5).sum / queries.length
    }
    val trained = recall(got.map(t => (t._1, t._2)))
    val sampled = recall(
      SparkEntry.queries("s03_knn_ivf")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))))
    info(f"s17 trained quantizer (P=${graft.ops.SimilarityOps.trainedProbes}): recall@5 $trained%.3f; " +
      f"s03 sampled (P=${graft.ops.SimilarityOps.ivfProbes}): $sampled%.3f over ${queries.length} queries")
    // measured: trained P=2 0.800 vs sampled P=4 0.680 - the trained
    // quantizer reaches HIGHER recall at HALF the probe budget even on
    // the adversarial near-random embeddings; floor pinned below the
    // measured value to guard regression without overfitting the seed
    assert(trained >= 0.7, f"trained-quantizer recall regressed: $trained%.3f")
    assert(trained >= sampled - 0.05,
      f"training stopped paying: trained $trained%.3f < sampled $sampled%.3f - 0.05")
  }
}
