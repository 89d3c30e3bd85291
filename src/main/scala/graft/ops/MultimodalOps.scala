package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as a
  * per-partition batch stage (`mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas`: one iterator per partition, codec state
  * initialized once per partition, rows streamed through).
  *
  * Decoding is behind the pluggable [[MediaCodec]] seam; the gate queries
  * run the deterministic [[MediaCodec.Stub]] (no media libraries in this
  * container), whose outputs are pure functions of the payload bytes and
  * therefore SQL-expressible — the plumbing is real and oracle-checked. */
object MultimodalOps {

  final case class MediaIn(doc_id: Long, payload: Array[Byte], source: String)
  final case class MediaMeta(doc_id: Long, media_type: String, width: Long,
      height: Long, n_frames: Long, size_bytes: Long)

  /** Reusable stage: binary-payload Dataset → metadata Dataset. The codec
    * session opens once per partition (decoder init), then rows stream. */
  def decodeMetadata(spark: SparkSession, media: DataFrame,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      it.map(sess.metadata)
    }.toDF()
  }

  /** Documents' text bytes stand in for media payloads; stub metadata is a
    * pure function of payload length → SQL oracle (ASCII: chars == bytes). */
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

  /** Frame sampling: slice each binary payload into fixed-size frames and
    * keep every Nth (the video/audio "sample k frames per clip" stage).
    * Same per-partition batch shape as [[decodeMetadata]]: the codec
    * session is the per-partition state — a real decoder replaces the
    * stub and nothing else changes. Row-wise flatMap: no shuffle, output
    * is offsets + per-frame digests (provenance a downstream trainer can
    * verify). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, every: Int = 4,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      it.flatMap { m =>
        val len = m.payload.length
        val nFrames = (len + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { fi =>
          val start = fi * frameBytes
          val (bytes, hex) = sess.slice(m.payload, start, frameBytes)
          FrameMeta(m.doc_id, fi.toLong, start + 1L, bytes.length.toLong, hex)
        }
      }
    }.toDF()
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
    * Per window: the codec's scalar feature (stub: exact unsigned-byte
    * sum — the stand-in for a spectral feature) and a content digest.
    * Tail windows shorter than W are kept (documented; an equal-length
    * formulation would drop starts past len − W). Same per-partition
    * batch shape as [[sampleFrames]]. Row-wise flatMap — no shuffle. */
  def segmentWindows(spark: SparkSession, media: DataFrame,
      winBytes: Int = 96, hopBytes: Int = 48,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      it.flatMap { m =>
        val len = m.payload.length
        val nWin = (len + hopBytes - 1) / hopBytes
        (0 until nWin).iterator.map { wi =>
          val start = wi * hopBytes
          val (bytes, hex) = sess.slice(m.payload, start, winBytes)
          WinMeta(m.doc_id, wi.toLong, start + 1L, bytes.length.toLong,
            sess.feature(bytes), hex)
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

  final case class ThumbMeta(doc_id: Long, thumb_w: Long, thumb_h: Long,
      thumb_energy: Long, thumb_md5: String)

  /** Thumbnail resize — the "shrink every image to a fixed grid" stage a
    * vision-data pipeline runs before embedding/featurizing. Nearest-
    * neighbor through the codec seam ([[MediaCodec.Session.resize]]): the
    * stub samples the payload as a srcW-wide byte stripe; a real codec
    * (ImageIoCodec) decodes and samples its true pixel grid — the
    * operator is identical either way. Output is metadata-width (energy +
    * a digest over the sampled intensities, spelled as the '-'-joined
    * decimal string so the oracle can reproduce it without binary
    * round-trips). Row-wise map: no shuffle, linear at any scale. */
  def thumbnail(spark: SparkSession, media: DataFrame,
      srcW: Int = 32, dstW: Int = 8, dstH: Int = 8,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      it.map { m =>
        val px = sess.resize(m.payload, srcW, dstW, dstH)
        var e = 0L
        var i = 0
        while (i < px.length) { e += px(i); i += 1 }
        val digest = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(px.mkString("-"))
        ThumbMeta(m.doc_id, dstW.toLong, dstH.toLong, e, digest)
      }
    }.toDF()
  }

  /** Oracle: the stub's stripe-gather is integer index arithmetic over
    * ASCII text (chars == bytes), so DuckDB reproduces each sampled
    * intensity with ascii(substring(...)) and the digest via string_agg
    * in pixel order. */
  val m04 = QueryDef(
    "m04_thumbnail",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      thumbnail(s, media)
    },
    Some("""
      WITH b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
                 FROM documents),
      g AS (SELECT doc_id, text, len, (len + 31) // 32 AS src_h FROM b),
      p AS (SELECT doc_id, text, len, src_h, unnest(range(0, 64)) AS pi FROM g),
      px AS (SELECT doc_id, pi,
               CASE WHEN (((pi // 8) * src_h) // 8) * 32 + (pi % 8) * 4 + 1 <= len
                    THEN ascii(substring(text,
                      CAST((((pi // 8) * src_h) // 8) * 32 + (pi % 8) * 4 + 1 AS INT), 1))
                    ELSE 0 END AS v
             FROM p)
      SELECT doc_id,
             CAST(8 AS BIGINT) AS thumb_w,
             CAST(8 AS BIGINT) AS thumb_h,
             CAST(sum(v) AS BIGINT) AS thumb_energy,
             md5(string_agg(CAST(v AS VARCHAR), '-' ORDER BY pi)) AS thumb_md5
      FROM px GROUP BY doc_id"""))

  final case class AHashRow(doc_id: Long, ahash: String)

  /** Average-hash (aHash) perceptual fingerprint — the classic image
    * near-dup signature: resize to an 8×8 grid through the codec seam,
    * then one bit per pixel: is it brighter than the image mean? The
    * comparison is EXACT integer arithmetic (`v·64 > Σv` — no division,
    * no float mean), and the 64 bits are spelled as a '0'/'1' string so
    * both engines agree without 64-bit sign/overflow games. Same
    * per-partition codec-session shape as the other m-ops; a real codec
    * (ImageIoCodec) replaces the stub and the operator is unchanged. */
  def perceptualHash(spark: SparkSession, media: DataFrame,
      srcW: Int = 32, codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      it.map { m =>
        val px = sess.resize(m.payload, srcW, 8, 8)
        var s = 0L
        var i = 0
        while (i < px.length) { s += px(i); i += 1 }
        val bits = new Array[Char](px.length)
        i = 0
        while (i < px.length) {
          bits(i) = if (px(i).toLong * 64L > s) '1' else '0'
          i += 1
        }
        AHashRow(m.doc_id, new String(bits))
      }
    }.toDF()
  }

  /** Perceptual near-dup grouping over the aHash: documents sharing a
    * fingerprint form a duplicate group; each row reports its group size
    * and whether it is the canonical (min-id) member — the keep/prune
    * verdict of an image-dedup pass. Shape: one row-wise hash map (no
    * shuffle), then ONE shuffle on the 64-bit fingerprint for the group
    * aggregate + join back — d01's exact-dedup economics on a perceptual
    * key; at 100 TB the hash table is one row per DISTINCT fingerprint.
    * Near-match (Hamming ≤ k) extends this with d02's banding over hash
    * nibbles — same plan family, a dial away. */
  val m05 = QueryDef(
    "m05_perceptual_neardup",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      val h = perceptualHash(s, media)
      val g = h.groupBy($"ahash")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.min($"doc_id").as("canonical_doc"))
      h.join(g, "ahash")
        .select($"doc_id", $"ahash", $"n_docs",
          ($"doc_id" === $"canonical_doc").as("is_canonical"))
    },
    Some("""
      WITH b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
                 FROM documents),
      g AS (SELECT doc_id, text, len, (len + 31) // 32 AS src_h FROM b),
      p AS (SELECT doc_id, text, len, src_h, unnest(range(0, 64)) AS pi FROM g),
      px AS (SELECT doc_id, pi,
               CASE WHEN (((pi // 8) * src_h) // 8) * 32 + (pi % 8) * 4 + 1 <= len
                    THEN ascii(substring(text,
                      CAST((((pi // 8) * src_h) // 8) * 32 + (pi % 8) * 4 + 1 AS INT), 1))
                    ELSE 0 END AS v
             FROM p),
      sums AS (SELECT doc_id, sum(v) AS sv FROM px GROUP BY doc_id),
      h AS (SELECT px.doc_id,
              string_agg(CASE WHEN px.v * 64 > sums.sv THEN '1' ELSE '0' END,
                         '' ORDER BY px.pi) AS ahash
            FROM px JOIN sums ON px.doc_id = sums.doc_id
            GROUP BY px.doc_id),
      ga AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS canonical_doc
             FROM h GROUP BY ahash)
      SELECT h.doc_id, h.ahash, ga.n_docs,
             h.doc_id = ga.canonical_doc AS is_canonical
      FROM h JOIN ga ON h.ahash = ga.ahash"""))

  val all: Seq[QueryDef] = Seq(m01, m02, m03, m04, m05)
}
