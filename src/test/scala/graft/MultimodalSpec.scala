package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{MediaCodec, MultimodalOps}

/** The multimodal operators' pluggable-codec seam: a deployment with real
  * media libraries registers its own [[MediaCodec]] and the operator
  * plumbing (schemas, batching, flatMap geometry) is untouched. */
object CodecProbe {
  // static (not serialized with the codec): counts session opens across
  // executor threads in this local-mode JVM
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Recognizably-not-the-stub codec: constant media type, reversed-slice
  * "decode", digest = length in hex, feature = first byte. */
class ReversingCodec extends MediaCodec {
  def open(): MediaCodec.Session = {
    CodecProbe.opens.incrementAndGet()
    new MediaCodec.Session {
      def metadata(in: MultimodalOps.MediaIn): MultimodalOps.MediaMeta =
        MultimodalOps.MediaMeta(in.doc_id, "custom", 1L, 1L, 1L,
          in.payload.length.toLong)
      def slice(payload: Array[Byte], start: Int, len: Int): (Array[Byte], String) = {
        val bytes = java.util.Arrays.copyOfRange(
          payload, start, math.min(start + len, payload.length)).reverse
        (bytes, f"${bytes.length}%08x")
      }
      def feature(bytes: Array[Byte]): Long =
        if (bytes.isEmpty) -1L else (bytes(0) & 0xff).toLong
    }
  }
}

class MultimodalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def media = {
    import spark.implicits._
    graft.ops.Q.table(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
  }

  test("a custom codec drops into every operator without plumbing changes") {
    import spark.implicits._
    val codec = new ReversingCodec
    val meta = MultimodalOps.decodeMetadata(spark, media, codec)
    assert(meta.select($"media_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("custom"))

    val frames = MultimodalOps.sampleFrames(spark, media, codec = codec)
    // digest comes from the custom codec (slice length in hex), and the
    // slice geometry (offsets, clamped lengths) stays the operator's
    val row = frames.where($"doc_id" === 0 && $"frame_idx" === 0).head()
    assert(row.getAs[String]("frame_md5") == f"${row.getAs[Long]("n_bytes")}%08x")

    val wins = MultimodalOps.segmentWindows(spark, media, codec = codec)
    // feature = first byte of the REVERSED window = last byte of the
    // original window: recompute from the source text and compare
    val w = wins.where($"doc_id" === 0 && $"win_idx" === 0).head()
    val text = graft.ops.Q.table(spark, dir, "documents")
      .where($"doc_id" === 0).head().getAs[String]("text")
    val lastByte = text.getBytes("UTF-8")
      .apply(math.min(96, text.getBytes("UTF-8").length) - 1) & 0xff
    assert(w.getAs[Long]("energy") == lastByte.toLong)
  }

  test("codec sessions open exactly once per partition") {
    CodecProbe.opens.set(0)
    val nParts = 5
    MultimodalOps.decodeMetadata(spark, media.repartition(nParts),
      new ReversingCodec).count()
    assert(CodecProbe.opens.get() == nParts,
      s"expected one open per partition, got ${CodecProbe.opens.get()}")
  }

  test("the default stub keeps m01-m03 oracle-identical (regression pin)") {
    // the seam refactor must not disturb the gate outputs: spot-check the
    // stub against the documented pure functions
    import spark.implicits._
    val m = MultimodalOps.decodeMetadata(spark, media)
      .where($"doc_id" === 1).head()
    val len = m.getAs[Long]("size_bytes")
    assert(m.getAs[Long]("width") == (len * 31 + 7) % 640 + 1)
    assert(m.getAs[Long]("height") == (len * 17 + 3) % 480 + 1)
  }
}
