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

  // -- structural inspection (stable across Spark's plan-string formats) --

  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
  import org.apache.spark.sql.execution.window.WindowExec

  /** Every node of the pre-execution physical plan (AQE unwrapped). */
  private def nodes(name: String): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => p +: p.children.flatMap(walk)
    }
    walk(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
  }

  /** The packing-shape pin, structurally: every window whose frame runs in
    * doc_id order (the corpus-width running sum) must partition by at
    * least (lang, blk) — a window partitioned by lang alone puts a whole
    * language's rows into ONE task and is the scale-killer shape. */
  private def assertBlockedPackingWindows(name: String): Unit = {
    val ws = nodes(name).collect { case w: WindowExec => w }
    assert(ws.nonEmpty, s"$name lost its packing window")
    val docOrdered = ws.filter(_.orderSpec.map(_.child).exists {
      case a: AttributeReference => a.name == "doc_id"
      case _ => false
    })
    assert(docOrdered.nonEmpty, s"$name: no doc_id-ordered running-sum window")
    docOrdered.foreach { w =>
      val parts = w.partitionSpec.collect { case a: AttributeReference => a.name }
      assert(parts.size >= 2 && parts.contains("blk"),
        s"$name: running sum partitioned by ${parts.mkString(",")} — " +
          "whole-language window (the scale-killer) is back")
    }
  }

  private def countCacheReads(name: String): Int =
    nodes(name).count(_.isInstanceOf[InMemoryTableScanExec])

  /** Plan nodes INCLUDING staged-cache build plans (InMemoryRelation
    * subtrees), recursively — where the corpus-scan work actually lives
    * for the staged pipelines. */
  private def deepNodes(name: String): Seq[SparkPlan] = {
    // each distinct cache's BUILD plan counts once, however many scans
    // read it (cache reuse is the point, not re-evaluation)
    val seen = new java.util.IdentityHashMap[SparkPlan, Unit]()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case i: InMemoryTableScanExec =>
        val build =
          if (seen.containsKey(i.relation.cachedPlan)) Nil
          else {
            seen.put(i.relation.cachedPlan, ())
            walk(i.relation.cachedPlan)
          }
        i +: (build ++ i.children.flatMap(walk))
      case _ => p +: p.children.flatMap(walk)
    }
    walk(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
  }

  test("q56 manifest: one metadata-width exchange, text never shuffles") {
    // the shard export's gate query must shuffle only (doc_id, shard,
    // skey) — if a refactor drags the text column through the exchange,
    // the export shuffles the whole corpus twice (once here, once in the
    // write pass)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val ex = nodes("q56_shard_export").collect { case e: ShuffleExchangeExec => e }
    assert(ex.size == 1, s"expected 1 shuffle, got ${ex.size}")
    val shuffled = ex.head.child.output.map(_.name)
    assert(!shuffled.contains("text"), s"text in shuffle: $shuffled")
  }

  test("k-means assignment is window-free (vectors never shuffle)") {
    // d16/s05 assign vectors to centroids through the row-wise native
    // nearest_centroid arg-max; if a refactor reintroduces the cross-join
    // + row_number spelling, every vector ships k times through a
    // per-vec_id exchange — the N·k explosion this family was built to
    // avoid — and a WindowExec reappears here
    for (n <- Seq("d16_semantic_dedup", "s05_kmeans_update")) {
      val ws = deepNodes(n).collect { case w: WindowExec => w }
      assert(ws.isEmpty, s"$n grew a window: ${ws.map(_.simpleStringWithNodeId())}")
      val evals = deepNodes(n)
        .flatMap(_.expressions)
        .map(_.collect { case c: graft.functions.NearestCentroid => c }.size)
        .sum
      assert(evals == 1, s"$n evaluates nearest_centroid $evals times")
    }
  }

  test("q46/q50 evaluate corpus_features exactly once per row") {
    // the one-pass analysis expression must stay single-evaluation: if
    // CollapseProject (or a pushed predicate) ever starts substituting it
    // into its ~9 GetStructField consumers, the corpus scan re-walks the
    // text per reference — the 10× landmine the expression was built to
    // remove (SCALE.md, q50 at 64×)
    for (n <- Seq("q46_corpus_report", "q50_sequence_pipeline")) {
      val evals = deepNodes(n)
        .flatMap(_.expressions)
        .map(_.collect { case c: graft.functions.CorpusFeatures => c }.size)
        .sum
      assert(evals == 1, s"$n evaluates corpus_features $evals times")
    }
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
    assertBlockedPackingWindows("q48_greedy_packing")
    // block offsets come back by broadcast, and both phases read the
    // staged narrow projection — the text is scanned once, in its build
    assert(plan("q48_greedy_packing").contains("BroadcastHashJoin"))
    assert(countCacheReads("q48_greedy_packing") >= 2)
  }

  test("t07/t08 text stages are shuffle-free row-wise projections") {
    for (n <- Seq("t07_repetition_stats", "t08_quality_filter")) {
      val p = plan(n)
      assert(!p.contains("Exchange"), s"$n shuffles:\n$p")
    }
  }

  test("s07 quantization is shuffle-free (higher-order funcs, no explode)") {
    // int8 quantization is one projection per vector; an explode +
    // re-aggregate spelling would shuffle every vector's 64 rows
    val p = plan("s07_embedding_quantize")
    assert(!p.contains("Exchange"), s"s07 shuffles:\n$p")
    assert(!p.contains("Generate"), s"s07 explodes:\n$p")
  }

  test("s09 random projection is shuffle-free (higher-order funcs, no explode)") {
    // 64→16 JL projection is one map pass per vector; an explode over
    // (dim × plane) pairs would shuffle 1024 rows per vector
    val p = plan("s09_random_projection")
    assert(!p.contains("Exchange"), s"s09 shuffles:\n$p")
    assert(!p.contains("Generate"), s"s09 explodes:\n$p")
  }

  test("d14 intra-doc dedup is shuffle-free (pure map pass, no explode)") {
    // first-occurrence filtering is higher-order array funcs over one
    // row; an explode + window spelling would shuffle every span
    val p = plan("d14_intradoc_dedup")
    assert(!p.contains("Exchange"), s"d14 shuffles:\n$p")
    assert(!p.contains("Generate"), s"d14 explodes:\n$p")
  }

  test("q57 merge: delta keys broadcast, base snapshot never shuffles") {
    // the anti join against the delta key set must be broadcast — a
    // shuffle anti join would exchange the 100 TB base for a day's delta
    val p = plan("q57_incremental_merge")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"delta anti-join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"base snapshot shuffles:\n$p")
  }

  test("q46 datasheet is single-scan: one text scan, two shuffles") {
    val p = plan("q46_corpus_report")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"re-scans the corpus:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q50 sequence pipeline: single text scan + blocked packing window") {
    // both packing-phase consumers read the staged chunk cache, so the
    // text is scanned only inside the cache build
    assert(countCacheReads("q50_sequence_pipeline") >= 2,
      "staged chunk frame not reused")
    // packing window is the blocked two-phase shape, never per-language
    assertBlockedPackingWindows("q50_sequence_pipeline")
  }

  test("dim joins broadcast; no cartesian product in relational paths") {
    for (n <- Seq("q03_shipping_priority", "q05_local_supplier_volume")) {
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n went cartesian:\n$p")
    }
  }

  test("d18 importance weights broadcast back onto the n-gram stream, never SMJ") {
    // the <=1024-row weight table is a model artifact (t11's LM rule):
    // losing the broadcast would shuffle the full n-gram stream at 100 TB
    val p = plan("d18_importance_select")
    assert(p.contains("BroadcastHashJoin"), s"weight join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"n-gram stream shuffles for the join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrdered"), s"top-K regressed to a full sort:\n$p")
  }

  test("q62/q63 sequence analytics: windowed sort, no collected arrays, no cartesian") {
    for (n <- Seq("q62_transition_matrix", "q63_interarrival_stats")) {
      val p = plan(n)
      // the skew-proof contract these share with q60: per-user sequences
      // flow through an O(1)-state window over a spillable sort — a
      // collect_list regression is a power-user task OOM at 100 TB
      assert(!p.contains("collect_list"), s"$n regressed to array collection:\n$p")
      assert(p.contains("Window"), s"$n lost its window:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
    // q62's row-total join is <=|event_types| rows — must broadcast
    assert(plan("q62_transition_matrix").contains("BroadcastHashJoin"),
      "q62 row-total join lost its broadcast")
  }

  test("q60 funnel: running-min windows over a spillable sort, never collect_list") {
    // the skew-proof contract (documented at Temporal.q60, re-proven on a
    // 300k-event hot user in ScaleSpec): per-user sequences flow through
    // O(1)-state running-min windows — a collect_list regression is one
    // un-spillable array task per power user at 100 TB
    val p = plan("q60_conversion_funnel")
    assert(!p.contains("collect_list"), s"q60 regressed to array collection:\n$p")
    assert(p.contains("Window"), s"q60 lost its running-min windows:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q61 cohort retention: distinct-aggregate shape, no count-distinct Expand") {
    // the joined frame is distinct per (user, week) and offset is a
    // bijection of week given the cohort, so the cell aggregate is a plain
    // count(*) — a count(DISTINCT) respelling would add an Expand pass
    // (q50's lesson) that doubles the shuffled volume for the same number
    val p = plan("q61_cohort_retention")
    assert(!p.contains("Expand"), s"q61 grew a count-distinct Expand pass:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"q61 cohort-size join lost its broadcast:\n$p")
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

  test("t11 bigram LM: vocab and LM tables broadcast onto the stream, never SMJ") {
    // The bigram stream is tokens-width; if any of the four joins (2×
    // vocab map, LM counts, context counts) degrades to a sort-merge
    // join, the whole stream shuffles on a string key — the scale-killer
    // this pin exists to catch. The only exchanges allowed are the
    // aggregations (vocab top-V, LM counts, per-doc rollup).
    val p = plan("t11_bigram_lm_score")
    assert(p.contains("BroadcastHashJoin"), s"LM joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"bigram stream shuffled for a join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q52 mixture sampling broadcasts the per-lang budgets, no cartesian") {
    val p = plan("q52_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), s"budget join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s10 PQ: codebook and query sides broadcast; rerank joins by hash; top-K partials") {
    val p = plan("s10_knn_pq")
    // the 64-row codebook (encode + reconstruct) and |Q| (ADC scan) are
    // the deliberate broadcast sides; a CartesianProduct would mean one
    // of them started shuffling the corpus
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"codebook/query sides not broadcast:\n$p")
    // candidate fetch (arn <= 100) must collapse to partial top-K below
    // the exchange, never a full per-query sort of the ADC scan
    assert(p.contains("WindowGroupLimit"), s"ADC rank filter not group-limited:\n$p")
    // rerank touches |Q|*100 rows via equality hash joins on vec_id
    assert(p.contains("HashJoin"), s"rerank join not hash-based:\n$p")
  }

  test("d17 semantic decontam: eval set broadcasts, the corpus never shuffles") {
    val p = plan("d17_semantic_decontam")
    // the eval set is the broadcast side; the corpus pass is row-wise —
    // any shuffle join here means the asymmetry was lost
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"eval set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the eval join:\n$p")
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

  test("t16/t17 scrub & script ID: pure row-wise map passes, zero exchanges") {
    // the 100 TB ideal shape these ship (and the reason they run 4-19x
    // FASTER than DuckDB at 64x, SCALE.md): regex battery + bounded
    // per-row lambdas over the scan, nothing shuffles, no explode
    for (n <- Seq("t16_pii_scrub", "t17_script_id")) {
      val p = plan(n)
      assert(!p.contains("Exchange"), s"$n grew a shuffle:\n$p")
      assert(!p.contains("Generate"), s"$n grew an explode:\n$p")
    }
  }

  test("q18 bloom dial: zero orders exchange under the flag, rows unchanged") {
    // Round-13 verdict item 4: the Bloom semi-join spelling (staged
    // post-HAVING aggregate + driver Bloom prefilter on the orders scan)
    // removes the 881 MB / 38.4 M-row orders exchange at 256× but loses
    // to job constants locally, so it ships as `-Dgraft.q18.bloom`
    // (default off). This pins BOTH halves of the contract: the dialed
    // plan never shuffles the orders table, and the dial changes no rows.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def rows(): Seq[String] =
      SparkEntry.queries("q18_large_orders")(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    def subtree(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(subtree)
    def shufflesOrders(e: SparkPlan): Boolean = subtree(e).exists {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("orders.parquet"))
      case _ => false
    }
    val plain = rows()
    assert(plain.nonEmpty)
    sys.props("graft.q18.bloom") = "true"
    try {
      assert(rows() == plain, "the bloom dial changed q18's rows")
      val ex = nodes("q18_large_orders").collect { case e: ShuffleExchangeExec => e }
      assert(!ex.exists(shufflesOrders),
        s"orders still shuffles under -Dgraft.q18.bloom:\n${plan("q18_large_orders")}")
      // and the prefilter is actually on the scan (the exactness argument
      // needs the exact join AFTER it, which the row equality just proved)
      assert(plan("q18_large_orders").contains("UDF"),
        "bloom prefilter missing from the dialed plan")
    } finally sys.props.remove("graft.q18.bloom")
  }

  test("t18 detokenize: distinct-word decode broadcasts onto the token explode") {
    // t15's contract: the per-word decode frame is vocabulary-scale and
    // must broadcast — a sort-merge regression would shuffle the full
    // corpus token stream on the join key
    val p = plan("t18_detokenize")
    assert(p.contains("BroadcastHashJoin"),
      s"t18 lost the vocabulary-side broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"t18 shuffles the token stream through a sort-merge join:\n$p")
  }
}
