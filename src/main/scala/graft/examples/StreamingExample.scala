package graft.examples

import graft.streaming._
import scala.concurrent.duration._

/** Supervised streaming pipeline: processing-time tick source (the
  * reference TimerPort analogue) → event-time windowed aggregation →
  * memory sink, run under the graft stage runtime and dismissed
  * gracefully — gasket's daemon-managed lifecycle, Spark-first. */
object StreamingExample {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    import org.apache.spark.sql.functions._

    val tether = StreamSupervisor.spawn("ticks") { () =>
      spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .withColumn("event_type", concat(lit("type"), col("value") % 3))
        .withColumn("value", col("value").cast("double"))
        .transform(df => EventTime.windowedAgg(df, tsCol = "timestamp",
          windowLen = "10 seconds", watermark = "5 seconds"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("tick_windows").start()
    }

    // the memory sink registers its table when the query starts on the
    // supervision thread — poll for existence first, then for rows
    val deadline = System.nanoTime() + 30.seconds.toNanos
    def rows(): Long =
      if (!spark.catalog.tableExists("tick_windows")) -1
      else spark.table("tick_windows").count()
    while (System.nanoTime() < deadline && rows() <= 0) Thread.sleep(200)

    println(s"STATE=${tether.checkState()} rows=${spark.table("tick_windows").count()}")
    tether.dismiss()
    tether.join()
    println(s"FINAL=${tether.currentPhase} metrics=${tether.readMetrics().toSeq.sorted}")
    spark.stop()
  }
}
