package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guardrails on the PHYSICAL plan shapes that make queries survive a
  * 100× scale-up. Correctness is the oracle gate's job; this spec pins the
  * scale properties — a Spark upgrade or an innocent-looking refactor that
  * silently turns a broadcast join into a cartesian product, or drops a
  * partial top-k below a shuffle, fails here instead of in production.
  *
  * Assertions read the pre-execution plan string (the AQE-initial plan:
  * what the optimizer committed to before runtime re-planning), so they
  * are deterministic and cheap — no job runs.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("d09 ranks with WindowGroupLimit partials below AND above the exchange") {
    val p = plan("d09_fixed_size_sample")
    // two occurrences: partial (pre-shuffle, caps what the exchange
    // carries at K·partitions rows/stratum) + final (post-shuffle)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("q47 chunking is shuffle-free (explode stays embarrassingly parallel)") {
    val p = plan("q47_chunk_windows")
    assert(!p.contains("Exchange"), p)
  }

  test("q48 packing: two-phase prefix sum, no whole-language window sort") {
    val p = plan("q48_greedy_packing")
    // the corpus-width running sum partitions by (lang, blk) — every
    // window group is bounded by the block width, not the language size
    assert("""windowspecdefinition\(lang#\d+, blk#\d+L, doc_id#\d+L ASC""".r
      .findFirstIn(p).isDefined, p)
    // the scale-killer shape (whole language in ONE window partition,
    // ordered by doc_id) must not reappear
    assert("""windowspecdefinition\(lang#\d+, doc_id#\d+L ASC""".r
      .findFirstIn(p).isEmpty, p)
    // block offsets come back by broadcast, and both phases read the
    // staged narrow projection — the text is scanned once, in its build
    assert(p.contains("BroadcastHashJoin"), p)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
  }

  test("t07/t08 text stages are shuffle-free row-wise projections") {
    for (n <- Seq("t07_repetition_stats", "t08_quality_filter")) {
      val p = plan(n)
      assert(!p.contains("Exchange"), s"$n shuffles:\n$p")
    }
  }

  test("q46 datasheet is single-scan: one text scan, two shuffles") {
    val p = plan("q46_corpus_report")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"re-scans the corpus:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q50 sequence pipeline: single text scan + blocked packing window") {
    val p = plan("q50_sequence_pipeline")
    // both packing-phase consumers read the staged chunk cache, so the
    // text is scanned only inside the cache build (the InMemoryRelation
    // printout repeats that build plan per reader; actual scans = 1)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"staged chunk frame not reused:\n$p")
    // packing window is the blocked two-phase shape, never per-language
    assert("""windowspecdefinition\(lang#\d+, blk#\d+L, doc_id#\d+L ASC""".r
      .findFirstIn(p).isDefined, p)
    assert("""windowspecdefinition\(lang#\d+, doc_id#\d+L ASC""".r
      .findFirstIn(p).isEmpty, p)
  }

  test("dim joins broadcast; no cartesian product in relational paths") {
    for (n <- Seq("q03_shipping_priority", "q05_local_supplier_volume")) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n went cartesian:\n$p")
    }
  }

  test("LSH dedup candidates come from equality joins, never nested-loop") {
    val p = plan("d02_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q44 BM25 joins the 1-row corpus stats by broadcast, not shuffle") {
    val p = plan("q44_bm25_search")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"stats side not broadcast:\n$p")
  }

  test("s02 LSH candidates come from an equality hash join on the bucket") {
    val p = plan("s02_knn_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin"), s"bucket join not hash-based:\n$p")
  }

  test("d10 weighted sample ranks with WindowGroupLimit partials (like d09)") {
    val p = plan("d10_weighted_sample")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("d11 span dedup: repeated-span set joins by hash, never nested-loop") {
    val p = plan("d11_span_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), s"span-frequency join not hash-based:\n$p")
  }

  test("q51 domain gate broadcasts the per-source stats back onto the scan") {
    val p = plan("q51_domain_quality_gate")
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"tiny stats side shuffled:\n$p")
  }

  test("t09 surprisal broadcasts the vocabulary onto the token stream") {
    val p = plan("t09_token_surprisal")
    assert(p.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q52 mixture sampling broadcasts the per-lang budgets, no cartesian") {
    val p = plan("q52_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), s"budget join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s05 k-means assigns against BROADCAST centroids, never a shuffle product") {
    val p = plan("s05_kmeans_update")
    // K centroids ≪ N vectors: the deliberate K×N pass must be a broadcast
    // nested-loop (or hash) join, never a partition-shuffling cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroids not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("filters reach the parquet scan (pushdown not regressed)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.replaceAll("\\s", "").contains("PushedFilters:[]"), p)
  }
}
