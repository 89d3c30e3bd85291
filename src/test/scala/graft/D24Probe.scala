package graft

/** Throwaway round-16 probe: where do d24's seconds (and its 4–16 s
  * run-to-run dispersion) live at sf0.1? Times each phase of the d24
  * composition separately across N cold repetitions.
  *
  * Usage: sbt "Test/runMain graft.D24Probe <dataDir> [reps]"
  */
object D24Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local()
    import org.apache.spark.sql.functions.coalesce

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[d24probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warm once
    graft.ops.Q.releaseAllPersisted(spark)
    graft.ops.DedupOps.d24.run(spark, dir).queryExecution.toRdd.count()

    for (rep <- 1 to reps) {
      graft.ops.Q.releaseAllPersisted(spark)
      System.gc()
      System.err.println(s"---- rep $rep ----")
      val total0 = System.nanoTime()
      import spark.implicits._
      t("s15KnnFrame (materialize)") {
        graft.ops.DedupOps.s15KnnFrame(spark, dir).queryExecution.toRdd.count()
      }
      val edges = t("d24 edges (cache+count)") {
        val e = graft.ops.Q.staged("d24_edges", dir) {
          spark.sql(s"""
            SELECT k.src AS doc_a, k.nb AS doc_b
            FROM s15_knn k JOIN s15_knn m
              ON m.src = k.nb AND m.nb = k.src
            WHERE k.cos >= ${graft.ops.DedupOps.semGraphTau}
              AND m.cos >= ${graft.ops.DedupOps.semGraphTau}""")
        }
        e.count()
        e
      }
      val labels = t("minLabelComponents") {
        graft.ops.Q.withAdvisoryCoalesce(spark) {
          val l = graft.ops.DedupOps.minLabelComponents(spark, edges)
          l.queryExecution.toRdd.count()
          l
        }
      }
      t("final left join") {
        graft.ops.Q.table(spark, dir, "embeddings").select($"vec_id")
          .join(labels, $"vec_id" === labels("id"), "left")
          .select($"vec_id",
            coalesce($"cluster", $"vec_id").as("sem_cluster_id"),
            ($"cluster".isNotNull && $"cluster" =!= $"vec_id").as("is_pruned"))
          .queryExecution.toRdd.count()
      }
      System.err.println(f"[d24probe] rep $rep TOTAL ${(System.nanoTime() - total0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
