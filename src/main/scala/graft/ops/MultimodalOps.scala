package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as a
  * per-partition batch stage (`mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas`: one iterator per partition, codec state
  * initialized once per partition, rows streamed through).
  *
  * The actual codec is a STUB (no image/audio libraries in this container):
  * `decodeStub` derives deterministic fake dimensions from the byte
  * payload. The Spark-side plumbing — binary schema, encoder round-trip,
  * partition-wise batching, metadata struct — is real and oracle-checked
  * (the fake is a pure function of payload length, expressible in SQL).
  */
object MultimodalOps {

  final case class MediaIn(doc_id: Long, payload: Array[Byte], source: String)
  final case class MediaMeta(doc_id: Long, media_type: String, width: Long,
      height: Long, n_frames: Long, size_bytes: Long)

  /** STUB decode: real implementation would parse the container header /
    * decode frames here (per-partition codec init, then per-row decode). */
  private def decodeStub(in: MediaIn): MediaMeta = {
    val len = in.payload.length.toLong
    MediaMeta(
      doc_id = in.doc_id,
      media_type = if (len % 3 == 0) "image" else if (len % 3 == 1) "audio" else "video",
      width = (len * 31 + 7) % 640 + 1,
      height = (len * 17 + 3) % 480 + 1,
      n_frames = len % 30 + 1,
      size_bytes = len)
  }

  /** Reusable stage: binary-payload Dataset → metadata Dataset. */
  def decodeMetadata(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      // per-partition codec bootstrap would go here (mirrors
      // Worker::bootstrap, /root/reference/gasket/src/framework.rs:103)
      it.map(decodeStub)
    }.toDF()
  }

  /** Documents' text bytes stand in for media payloads; metadata is a pure
    * function of payload length → SQL oracle (ASCII text: chars == bytes). */
  val m01 = QueryDef(
    "m01_media_metadata",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      decodeMetadata(s, media)
    },
    Some("""
      WITH b AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len FROM documents)
      SELECT doc_id,
             CASE WHEN len % 3 = 0 THEN 'image'
                  WHEN len % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             (len * 31 + 7) % 640 + 1 AS width,
             (len * 17 + 3) % 480 + 1 AS height,
             len % 30 + 1 AS n_frames,
             len AS size_bytes
      FROM b"""))

  final case class FrameMeta(doc_id: Long, frame_idx: Long, byte_start: Long,
      n_bytes: Long, frame_md5: String)

  /** Shared slice-and-digest mechanics for the per-partition "codecs":
    * clamp-slice `[start, start+len)` out of the payload and hex-digest
    * it with the partition's digest instance. */
  private def sliceDigest(md: java.security.MessageDigest,
      payload: Array[Byte], start: Int, len: Int): (Array[Byte], String) = {
    val bytes = java.util.Arrays.copyOfRange(
      payload, start, math.min(start + len, payload.length))
    md.reset()
    (bytes, md.digest(bytes).map("%02x".format(_)).mkString)
  }

  /** Frame sampling: slice each binary payload into fixed-size frames and
    * keep every Nth (the video/audio "sample k frames per clip" stage).
    * Same per-partition batch shape as [[decodeMetadata]]: the digest
    * "codec" is initialized once per partition and rows stream through —
    * swap `MessageDigest` for a real decoder and nothing else changes.
    * Row-wise flatMap: no shuffle, output is offsets + per-frame digests
    * (provenance a downstream trainer can verify). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, every: Int = 4): DataFrame = {
    import spark.implicits._
    val ds = media.as[MediaIn].mapPartitions { it =>
      // per-partition codec bootstrap (mirrors Worker::bootstrap,
      // /root/reference/gasket/src/framework.rs:103)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val len = m.payload.length
        val nFrames = (len + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { fi =>
          val start = fi * frameBytes
          val (bytes, hex) = sliceDigest(md, m.payload, start, frameBytes)
          FrameMeta(m.doc_id, fi.toLong, start + 1L, bytes.length.toLong, hex)
        }
      }
    }
    ds.toDF()
  }

  /** Oracle: ASCII payloads mean byte slices == character substrings, so
    * DuckDB's md5(substring(...)) replicates the frame digests exactly. */
  val m02 = QueryDef(
    "m02_frame_sample",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      sampleFrames(s, media)
    },
    Some("""
      WITH b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
                 FROM documents),
      f AS (SELECT doc_id, text, len,
              unnest(range(0, (len + 63) // 64, 4)) AS fi FROM b)
      SELECT doc_id,
             CAST(fi AS BIGINT) AS frame_idx,
             CAST(fi * 64 + 1 AS BIGINT) AS byte_start,
             CAST(least(64, len - fi * 64) AS BIGINT) AS n_bytes,
             md5(substring(text, CAST(fi * 64 + 1 AS INT), 64)) AS frame_md5
      FROM f"""))

  final case class WinMeta(doc_id: Long, win_idx: Long, byte_start: Long,
      n_bytes: Long, energy: Long, win_md5: String)

  /** Overlapping window segmentation — the audio analysis-frame shape
    * (STFT-style: window W bytes, hop H < W, 50% overlap by default).
    * Per window: an energy proxy (exact unsigned-byte sum — the stand-in
    * for the spectral feature a real DSP codec would emit) and a digest.
    * Tail windows shorter than W are kept (documented; an equal-length
    * formulation would drop starts past len − W). Same per-partition
    * batch shape as [[sampleFrames]]: swap the digest/energy loop for a
    * real FFT and nothing else changes. Row-wise flatMap — no shuffle. */
  def segmentWindows(spark: SparkSession, media: DataFrame,
      winBytes: Int = 96, hopBytes: Int = 48): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      // per-partition codec bootstrap (mirrors Worker::bootstrap,
      // /root/reference/gasket/src/framework.rs:103)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val len = m.payload.length
        val nWin = (len + hopBytes - 1) / hopBytes
        (0 until nWin).iterator.map { wi =>
          val start = wi * hopBytes
          val (bytes, hex) = sliceDigest(md, m.payload, start, winBytes)
          var e = 0L
          var i = 0
          while (i < bytes.length) { e += (bytes(i) & 0xff); i += 1 }
          WinMeta(m.doc_id, wi.toLong, start + 1L, bytes.length.toLong, e, hex)
        }
      }
    }.toDF()
  }

  /** Oracle: ASCII payloads — byte slices == substrings and byte values ==
    * character codes, so energy and digests replicate exactly in SQL. */
  val m03 = QueryDef(
    "m03_window_segments",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      segmentWindows(s, media)
    },
    Some("""
      WITH b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
                 FROM documents),
      w AS (SELECT doc_id, text, len,
              unnest(range(0, (len + 47) // 48)) AS wi FROM b),
      sub AS (SELECT doc_id, wi,
                substring(text, CAST(wi * 48 + 1 AS INT), 96) AS win FROM w)
      SELECT doc_id,
             CAST(wi AS BIGINT) AS win_idx,
             CAST(wi * 48 + 1 AS BIGINT) AS byte_start,
             CAST(length(win) AS BIGINT) AS n_bytes,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(win) + 1),
                 i -> CAST(ascii(substring(win, i, 1)) AS BIGINT))),
               (a, c) -> a + c) AS BIGINT) AS energy,
             md5(win) AS win_md5
      FROM sub"""))

  val all: Seq[QueryDef] = Seq(m01, m02, m03)
}
