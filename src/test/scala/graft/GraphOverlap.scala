package graft

/** Test-scope evidence harness (round 15): edge-set agreement of the
  * two-level (supercell-probed) trained k-NN graph against the flat
  * trained graph at scale — the quality counterpart of the speed
  * numbers in SCALE.md "two-level assignment". At gate SFs the spec
  * proves exact equality (all groups probed); at 64×+ partial probing
  * is a real approximation and this prints the measured edge overlap.
  *
  * Usage: sbt "Test/runMain graft.GraphOverlap <dataDir> <K>"
  */
object GraphOverlap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val spark = Sessions.local()
    sys.props("graft.knngraph.twoLevelK") = "1000000" // force flat
    val flat = graft.ops.DedupOps.s15KnnFrameWith(spark, dir, Some(k))
      .selectExpr("src", "nb").distinct().persist()
    val nf = flat.count()
    sys.props("graft.knngraph.twoLevelK") = "1024" // shipped default
    val two = graft.ops.DedupOps.s15KnnFrameWith(spark, dir, Some(k))
      .selectExpr("src", "nb").distinct().persist()
    val nt = two.count()
    val inter = flat.intersect(two).count()
    println(f"""{"flat_edges":$nf,"two_level_edges":$nt,"common":$inter,"overlap_of_flat":${inter.toDouble / math.max(1L, nf)}%.4f}""")
    spark.stop()
  }
}
