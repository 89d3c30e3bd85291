package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-files maintenance for parquet directories — the 100 TB operational
  * chore every long-lived corpus accumulates: streaming sinks and
  * per-batch ingests leave thousands of KB-sized part files, and scan
  * throughput collapses under per-file open/footer costs long before the
  * data is big. Compaction rewrites a directory into size-targeted files,
  * optionally range-clustered so later scans prune by the sort key.
  *
  * Planning happens from filesystem metadata only (one `listStatus`, no
  * data read); the rewrite is one distributed pass:
  * `repartitionByRange(sortCols)` (range partition → file-level min/max
  * bounds are disjoint, so a filtered scan skips whole files) or plain
  * `repartition(n)` when no sort is requested, then `sortWithinPartitions`
  * for intra-file locality.
  */
object Compactor {

  final case class Report(filesBefore: Int, bytesBefore: Long, filesAfter: Int)

  private def parts(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Rewrite `inDir` (a flat parquet directory) into `outDir` with
    * ~`targetBytes` per output file. When `sortCols` is non-empty the data
    * is range-clustered on them (disjoint per-file key ranges) and sorted
    * within each file. */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long,
      sortCols: Seq[String] = Nil): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = parts(spark, inDir)
    val totalBytes = before.map(_._2).sum
    // parquet re-encodes (dictionary/RLE reset per file), so output size ≈
    // input size is the usable planning estimate; the ±1-file error from
    // re-encoding drift is irrelevant next to the 1000×-file-count fix
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty) {
        val cols = sortCols.map(col)
        df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      } else df.repartition(n)
    shaped.write.mode("overwrite").parquet(outDir)
    Report(before.size, totalBytes, parts(spark, outDir).size)
  }
}
