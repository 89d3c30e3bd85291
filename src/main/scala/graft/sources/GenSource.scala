package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 custom source `graft-gen`: a deterministic, partitioned
  * synthetic-row generator (no files, no driver materialization).
  *
  * Capabilities demonstrated: TableProvider + DataSourceRegister (short
  * name), batch scan planning with N independent [[InputPartition]]s
  * (rows are generated executor-side, so it scales like any parallel
  * scan), and column pruning via [[SupportsPushDownRequiredColumns]] —
  * unneeded columns are never computed (visible in the scan's
  * `ReadSchema`).
  *
  * Options: `rows` (default 1000), `partitions` (default 4). Rows are a
  * pure function of row id (Knuth-hash mixing), so any two reads —
  * anywhere on a cluster — produce identical data.
  */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.fullSchema

  // Lets Spark hand a user-specified schema through to getTable — where we
  // validate it instead of silently ignoring it (DSv2 TableProvider
  // contract: a provider accepting external metadata must produce rows of
  // exactly that schema).
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 TableProvider contract: `schema` is either our own inferred
    // schema or one the user forced via .schema(...). This source generates
    // exactly fullSchema, so anything else must be rejected loudly —
    // silently ignoring it would hand back rows that don't match the
    // schema Catalyst planned against.
    if (schema != GenSource.fullSchema)
      throw new IllegalArgumentException(
        s"graft-gen does not support user-specified schemas: got $schema, " +
          s"produces ${GenSource.fullSchema}")
    // DSv2 options are case-insensitive by convention; the map handed
    // here is the case-sensitive view, so re-wrap it
    val opts = new CaseInsensitiveStringMap(properties)
    new GenTable(
      opts.getOrDefault("rows", "1000").toLong,
      opts.getOrDefault("partitions", "4").toInt,
      opts.getOrDefault("rowsPerBatch", "100").toLong)
  }
}

object GenSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("label", StringType, nullable = false)))

  private final val Epoch = 1700000000000000L // µs

  def mix(id: Long): Long = (id * 2654435761L) & 0xFFFFFFFFL

  def splitRange(start: Long, end: Long, partitions: Int): Array[InputPartition] = {
    val total = math.max(0L, end - start)
    val per = (total + partitions - 1) / math.max(1, partitions)
    if (per == 0) Array.empty
    else (0 until partitions).flatMap { p =>
      val s = start + p * per
      val e = math.min(s + per, end)
      if (s < e) Some(GenPartition(s, e): InputPartition) else None
    }.toArray
  }

  /** Deterministic field value for (rowId, fieldName). */
  def value(id: Long, field: String): Any = field match {
    case "id" => id
    case "key" => mix(id) % 97
    case "ts" => Epoch + (mix(id + 1) % 86400000L) * 1000L
    case "value" => (mix(id + 2) % 100000L).toDouble / 100.0
    case "label" => UTF8String.fromString(s"g${mix(id + 3) % 5}")
  }
}

private class GenTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, partitions, rowsPerBatch)
}

private class GenScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var prunedSchema: StructType = GenSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = prunedSchema
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-gen rows=$rows cols=${prunedSchema.fieldNames.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] =
      GenSource.splitRange(0L, rows, partitions)

    override def createReaderFactory(): PartitionReaderFactory =
      new GenReaderFactory(prunedSchema.fieldNames)

    /** Finite micro-batch stream: each trigger advances the offset by
      * `rowsPerBatch` until `rows` — then `latestOffset` plateaus, so
      * `processAllAvailable()` drains deterministically. */
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new MicroBatchStream with SupportsAdmissionControl {
        // Admission-control throttling: the next batch end is derived
        // from the COMMITTED start offset Spark hands us, so a restarted
        // query resumes exactly where the checkpoint left off (a stream-
        // local counter would rewind offsets and replay rows).
        override def initialOffset(): Offset = GenOffset(0L)
        override def latestOffset(start: Offset, limit: ReadLimit): Offset =
          GenOffset(math.min(start.asInstanceOf[GenOffset].n + rowsPerBatch, rows))
        override def latestOffset(): Offset =
          throw new UnsupportedOperationException(
            "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
        override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
        override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()
        override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
          GenSource.splitRange(start.asInstanceOf[GenOffset].n,
            end.asInstanceOf[GenOffset].n, partitions)
        override def createReaderFactory(): PartitionReaderFactory =
          new GenReaderFactory(prunedSchema.fieldNames)
      }
  }
}

private case class GenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class GenReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val GenPartition(start, end) = partition
    new PartitionReader[InternalRow] {
      // resolve field dispatch once per reader, not per row
      private val gens: Array[Long => Any] =
        fields.map(f => (id: Long) => GenSource.value(id, f))
      private var cur = start - 1
      override def next(): Boolean = { cur += 1; cur < end }
      override def get(): InternalRow = {
        val values = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { values(i) = gens(i)(cur); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}

private case class GenPartition(start: Long, end: Long) extends InputPartition
