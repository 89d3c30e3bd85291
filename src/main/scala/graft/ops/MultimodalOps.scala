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

  /** The oracle's independent aHash derivation (the Stub codec's stripe
    * resize + brighter-than-mean bits as pure SQL) — ONE spelling shared
    * by m05 and m06 so the two oracles cannot drift. ASCII assumption:
    * strlen/substring/ascii index CHARACTERS while the engine hashes raw
    * UTF-8 payload BYTES — identical only because `documents.text` is
    * ASCII (verified: zero non-ASCII rows at every shipped SF, asserted
    * in MultimodalSpec's "documents.text is ASCII" pin; m01-m04 oracles
    * lean on the same equivalence). */
  private def oAHashCtes: String = """
      b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
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
            GROUP BY px.doc_id)"""

  /** Perceptual near-dup grouping over the aHash: documents sharing a
    * fingerprint form a duplicate group; each row reports its group size
    * and whether it is the canonical (min-id) member — the keep/prune
    * verdict of an image-dedup pass. Shape: one row-wise hash map (no
    * shuffle), then ONE shuffle on the 64-bit fingerprint for the group
    * aggregate + join back — d01's exact-dedup economics on a perceptual
    * key; at 100 TB the hash table is one row per DISTINCT fingerprint.
    * Near-match (Hamming ≤ k) is m06's banding over hash nibbles. */
  val m05 = QueryDef(
    "m05_perceptual_neardup",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      // checkpointed: h feeds the group aggregate AND the join back —
      // left lazy, the payload scan + decode + hash pass ran twice
      // (PlanAudit round 12; perceptualNeighbors already treats its dh
      // frame this way). Metadata-width, so effectively free.
      val h = roundCheckpoint(perceptualHash(s, media))
      val g = h.groupBy($"ahash")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.min($"doc_id").as("canonical_doc"))
      h.join(g, "ahash")
        .select($"doc_id", $"ahash", $"n_docs",
          ($"doc_id" === $"canonical_doc").as("is_canonical"))
    },
    Some(s"""
      WITH $oAHashCtes,
      ga AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS canonical_doc
             FROM h GROUP BY ahash)
      SELECT h.doc_id, h.ahash, ga.n_docs,
             h.doc_id = ga.canonical_doc AS is_canonical
      FROM h JOIN ga ON h.ahash = ga.ahash"""))

  /** Hamming-tolerance dial for m06: near-dup images whose aHashes differ
    * in ≤ `m06MaxHam` bits group together. Banding into 8 bytes makes
    * candidate generation EXACT, not approximate: two 64-bit hashes
    * within Hamming distance d < 8 differ in at most d bands, so at
    * least one of the 8 band values matches (pigeonhole) — every
    * qualifying pair surfaces as a band-join candidate. Band width is a
    * measured dial, not a guess: aHash bits are heavily correlated on
    * real data (bright images skew whole nibbles to 1), and at sf0.01
    * 4-bit bands put ~40% of all distinct hashes into one '1111' bucket
    * (368k candidate pairs from 487 hashes ≈ all-pairs); 8-bit bands cut
    * that to 36k while still guaranteeing completeness for d < 8. */
  private[graft] val m06MaxHam = 2
  private[graft] val m06Bands = 8

  /** Hamming distance between two 64-char binary-string fingerprints as
    * two 32-bit conv + XOR + bit_count halves — plain codegen'd integer
    * ops per pair (the 64× substring lambda this replaced was ~10×
    * slower on fat candidate sets); 32-bit halves keep conv's unsigned
    * result inside BIGINT. */
  private[graft] def sHam64(a: String, b: String): String = {
    def half(off: Int) =
      s"bit_count(CAST(conv(substring($a, $off, 32), 2, 10) AS BIGINT) ^ " +
        s"CAST(conv(substring($b, $off, 32), 2, 10) AS BIGINT))"
    s"CAST(${half(1)} + ${half(33)} AS BIGINT)"
  }

  /** Banded Hamming-neighbor aggregation over a (doc_id, ahash) frame —
    * d02's LSH-banding economics on the perceptual key. Plan shape, in
    * order: ONE shuffle on the fingerprint (distinct-hash groups — the
    * only stage that sees N rows); an `m06Bands`× (8×) band explode over
    * DISTINCT hashes only (metadata-width); band-key EQUI-join for candidates
    * (never a cross join); a 64-char compare per candidate pair; a
    * metadata-width edge aggregate joined back. A hash class present on
    * both sides of a ≤`maxHam` pair reports its neighbor classes and the
    * total near-dup docs behind them — the dedup-review surface of an
    * image pipeline. Skew note: a degenerate corpus of near-constant
    * images concentrates one band value, the same documented dial as
    * d02's band width (widen bands or pre-split hot buckets). */
  def perceptualNeighbors(spark: SparkSession, hashes: DataFrame,
      maxHam: Int = m06MaxHam): DataFrame = {
    // completeness is the pigeonhole argument: d < m06Bands byte-flips
    // cannot touch all m06Bands bands, so some band matches exactly. At
    // maxHam >= m06Bands the recall guarantee silently vanishes — refuse.
    require(maxHam < m06Bands,
      s"perceptualNeighbors: maxHam=$maxHam >= bands=$m06Bands would drop " +
        "the pigeonhole completeness guarantee (add bands or lower maxHam)")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // materialize the distinct-hash frame before the band self-join: both
    // join sides (and the final report join) would otherwise recompute
    // the ENTIRE upstream — payload scan + codec decode + fingerprint —
    // once per reference. dh is metadata-width (one row per distinct
    // 64-bit class), so the checkpoint is effectively free
    val dh = roundCheckpoint(hashes.groupBy($"ahash")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical_doc")))
    // explicit (bi, bv) repartition before the self-join: the band frames
    // are only tens of KB, so AQE's size-based advisory coalesces them to
    // ONE partition — but the join's OUTPUT is the candidate-pair
    // explosion (~1M rows at sf0.1), and generating + Hamming-scoring it
    // single-task serialized the whole operator (StageProfile: a 4.3 s
    // one-task stage). Keying the exchange by band spreads pair
    // generation across the shuffle partitions and the join needs no
    // further exchange.
    val bands = dh.select($"ahash",
        explode(expr(s"transform(sequence(0, ${m06Bands - 1}), " +
          "i -> struct(i AS bi, substring(ahash, i*8+1, 8) AS bv))")).as("b"))
      .select($"ahash", $"b.bi".as("bi"), $"b.bv".as("bv"))
      // the partition COUNT is pinned: a bare repartition(cols) is
      // advisory under AQE, which sized the tiny exchange back down to
      // one partition and re-serialized the join (re-profiled)
      .repartition(spark.sparkContext.defaultParallelism, $"bi", $"bv")
    val near = bands.as("x").join(bands.as("y"),
        $"x.bi" === $"y.bi" && $"x.bv" === $"y.bv" && $"x.ahash" < $"y.ahash")
      .select($"x.ahash".as("ha"), $"y.ahash".as("hb"))
      .distinct()
      .withColumn("ham", expr(sHam64("ha", "hb")))
      .where($"ham" <= maxHam)
    // both edge directions from ONE pass over `near`: the
    // union-of-two-projections spelling referenced `near` twice, and a
    // multiply-referenced non-materialized frame re-executes per
    // reference — PlanAudit caught the band join + Hamming verify
    // running twice. An explode of the two directions is a row-local
    // rewrite of the same rows.
    val edges = near.select(explode(expr(
        "array(struct(ha AS ahash, hb AS other), " +
        "struct(hb AS ahash, ha AS other))")).as("e"))
      .select($"e.ahash", $"e.other")
    val nb = edges
      .join(dh.select($"ahash".as("other"), $"n_docs".as("other_docs")), "other")
      .groupBy($"ahash")
      .agg(count(lit(1)).as("n_neighbor_hashes"),
        sum($"other_docs").as("n_neighbor_docs"))
    dh.join(nb, Seq("ahash"), "left")
      .select($"ahash", $"n_docs", $"canonical_doc",
        coalesce($"n_neighbor_hashes", lit(0L)).as("n_neighbor_hashes"),
        coalesce($"n_neighbor_docs", lit(0L)).as("n_neighbor_docs"))
  }

  /** Hamming-tolerant perceptual near-dup (m05's documented extension
    * made real): per distinct aHash class, its size, canonical doc, and
    * the neighboring classes within `m06MaxHam` flipped bits — so
    * re-encoded/slightly-perturbed images that no longer collide exactly
    * still surface as near-dups. The DuckDB oracle brute-forces all
    * distinct-hash pairs (an INDEPENDENT derivation — no banding), which
    * doubles as the completeness proof of the pigeonhole argument. */
  val m06 = QueryDef(
    "m06_perceptual_banded",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      perceptualNeighbors(s, perceptualHash(s, media))
    },
    Some(s"""
      WITH $oAHashCtes,
      dh AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS canonical_doc
             FROM h GROUP BY ahash),
      e AS (SELECT a.ahash AS ahash, b.n_docs AS other_docs,
              len(list_filter(range(1, 65),
                i -> substring(a.ahash, i, 1) <> substring(b.ahash, i, 1))) AS ham
            FROM dh a JOIN dh b ON a.ahash <> b.ahash),
      nb AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_neighbor_hashes,
               CAST(sum(other_docs) AS BIGINT) AS n_neighbor_docs
             FROM e WHERE ham <= $m06MaxHam GROUP BY ahash)
      SELECT dh.ahash, dh.n_docs, dh.canonical_doc,
             CAST(coalesce(nb.n_neighbor_hashes, 0) AS BIGINT) AS n_neighbor_hashes,
             CAST(coalesce(nb.n_neighbor_docs, 0) AS BIGINT) AS n_neighbor_docs
      FROM dh LEFT JOIN nb ON dh.ahash = nb.ahash"""))

  private[graft] case class PBandRow(
      doc_id: Long, bi: Long, bv: String, ahash: String)
  private[graft] case class POwner(owner: Long, ahash: String)
  private[graft] case class PerceptualHit(
      bi: Long, owner_doc: Long, dup_doc: Long)

  private def hammingStr(a: String, b: String): Int = {
    var i = 0; var n = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) n += 1; i += 1 }
    n
  }

  /** m07's stream, factored from the gate staging (q58's
    * [[StreamingGate.neardupHits]] pattern) so StreamingSpec can drive it
    * under the RocksDB provider: media batches arrive as a file stream,
    * each image row-wise aHashes ([[perceptualHash]] — a stateless typed
    * map, streaming-legal), explodes into its `m06Bands` band keys, and
    * `flatMapGroupsWithState` keyed by (band, band-value) keeps ONE owner
    * per bucket — the first batch's min-doc claimant WITH its full hash.
    * A later-batch doc colliding in a band is emitted as a suppression
    * hit only if its full-hash Hamming distance to the owner is within
    * `m06MaxHam` — m06's verify step executed in-state, so the streaming
    * operator has banding's exact recall (pigeonhole) AND its precision.
    *
    * Scale: state is one (owner, 64-char hash) row per DISTINCT live band
    * key ≪ corpus; per batch one band-key shuffle of the new docs only.
    * Unbounded deployments bound the registry exactly like q58 (RocksDB
    * provider + processing-time TTL); the bounded gate run uses
    * NoTimeout. */
  private[graft] def perceptualHitsStream(
      s: SparkSession, inDir: java.nio.file.Path,
      sch: org.apache.spark.sql.types.StructType,
      provider: Option[String]): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val media = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"))
    val bands = perceptualHash(s, media)
      .selectExpr("doc_id", "ahash",
        s"explode(transform(sequence(0, ${m06Bands - 1}), " +
          "i -> struct(CAST(i AS BIGINT) AS bi, " +
          "substring(ahash, i*8+1, 8) AS bv))) AS b")
      .selectExpr("doc_id", "b.bi AS bi", "b.bv AS bv", "ahash")
      .as[PBandRow]
    val hits = bands.groupByKey(r => (r.bi, r.bv))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[PBandRow],
         st: org.apache.spark.sql.streaming.GroupState[POwner]) =>
          val rs = rows.toSeq
          if (st.exists) {
            val o = st.get
            rs.filter(r => hammingStr(r.ahash, o.ahash) <= m06MaxHam)
              .map(_.doc_id).sorted.iterator
              .map(id => PerceptualHit(key._1, o.owner, id))
          } else {
            val first = rs.minBy(_.doc_id)
            st.update(POwner(first.doc_id, first.ahash))
            Iterator.empty
          }
      }
    val outDir = StreamingGate.tempDir("graft-m07-out").toString
    val ckpt = StreamingGate.tempDir("graft-m07-ckpt").toString
    graft.streaming.StateStores.withProvider(s, provider) {
      val q = hits.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // explicit schema: a zero-hit run leaves only _spark_metadata in the
    // sink dir, and schema inference would throw on a semantically-empty
    // (and oracle-matching) result
    s.read.schema(org.apache.spark.sql.Encoders.product[PerceptualHit].schema)
      .parquet(outDir)
  }

  private[graft] def perceptualStream(
      s: SparkSession, d: String, provider: Option[String]): DataFrame =
    perceptualHitsStream(s,
      StreamingGate.stageParityBatches(s, d, "documents"),
      table(s, d, "documents").schema, provider)

  /** Streaming perceptual near-dup — m06's banded image key running
    * through q58's ingest-time bucket-registry FSM: the composition a
    * multimodal pipeline ships (suppress re-encoded/perturbed images at
    * ingest, not in a nightly batch). Hits are strictly cross-batch
    * (batch-internal dups are m06's batch job); the oracle derives the
    * identical set in batch SQL — band buckets owned by the even-parity
    * batch, odd-parity claimants Hamming-verified against the owner's
    * hash. */
  val m07 = QueryDef(
    "m07_streaming_perceptual",
    (s, d) => perceptualStream(s, d, None),
    Some(s"""
      WITH $oAHashCtes,
      bands AS (SELECT doc_id, ahash, bi,
                  substring(ahash, CAST(bi * 8 + 1 AS INT), 8) AS bv
                FROM (SELECT doc_id, ahash, unnest(range(0, $m06Bands)) AS bi
                      FROM h)),
      own AS (SELECT bi, bv, min(doc_id) AS owner_doc,
                arg_min(ahash, doc_id) AS owner_hash
              FROM bands WHERE doc_id % 2 = 0 GROUP BY bi, bv)
      SELECT b.bi AS bi, o.owner_doc AS owner_doc, b.doc_id AS dup_doc
      FROM bands b JOIN own o ON b.bi = o.bi AND b.bv = o.bv
      WHERE b.doc_id % 2 = 1
        AND len(list_filter(range(1, 65),
              i -> substring(b.ahash, i, 1) <> substring(o.owner_hash, i, 1)))
            <= $m06MaxHam"""))

  /** DuckDB audio-fingerprint chain (proportional window spans over the
    * ASCII byte==char identity, the engine's exact geometry) ending at
    * `h(doc_id, fpCol)` — ONE spelling shared by the m08 and m09 oracles
    * so the two cannot drift (oAHashCtes' rule). CTE names are
    * parameterized so the chain composes into a WITH alongside others. */
  private def oAudioFpCtes(
      b: String, en: String, h: String, fpCol: String): String = s"""
      $b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
             FROM documents),
      $en AS (SELECT doc_id, list_transform(range(0, 65), wi ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(substring(text, CAST((wi * len) // 65 + 1 AS INT), CAST(((wi + 2) * len) // 65 - (wi * len) // 65 AS INT))) + 1),
                   i -> CAST(ascii(substring(substring(text, CAST((wi * len) // 65 + 1 AS INT), CAST(((wi + 2) * len) // 65 - (wi * len) // 65 AS INT)), i, 1)) AS BIGINT))),
                 (a, c) -> a + c)) AS e
             FROM $b),
      $h AS (SELECT doc_id, array_to_string(list_transform(range(0, 64),
               i -> CASE WHEN e[i + 2] > e[i + 1] THEN '1' ELSE '0' END), '')
               AS $fpCol
            FROM $en)"""

  /** Audio fingerprint (Haitsma–Kalker shape): the sign of the energy
    * delta between consecutive analysis windows, 64 bits over a 65-window
    * horizon. Window geometry is PER-CLIP proportional — window wi spans
    * bytes ⌊wi·len/65⌋ to ⌊(wi+2)·len/65⌋ (50% overlap, m03's STFT
    * shape) — so the horizon spans the whole clip and EVERY window is
    * non-empty, making every bit informative. Geometry matters more
    * than it looks: the first-shipped fixed-geometry spelling
    * zero-padded short clips, which concentrated tail bands on the
    * all-zero value — ONE band bucket held 58% of all distinct
    * fingerprints and the band join degenerated toward all-pairs
    * (measured 22.5 s at sf0.1; a ⌈len/65⌉-hop variant still left the
    * truncated tail biased, max bucket 2816 of 4858). Proportional
    * spans drop the max bucket to 246 and the candidate load 5× (SCALE
    * .md). Windows come from the codec session's slice + scalar
    * feature, so a real decoder (WavCodec) drops in unchanged.
    *
    * Shape: ZERO shuffles — one row-wise map over the payloads; only
    * (doc_id, 64-char fingerprint) leaves the scan. */
  def audioFingerprint(spark: SparkSession, media: DataFrame,
      horizon: Int = 65,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    // CPU-bound per-row decode: a small single-file scan arrives as ONE
    // partition (3 MB of sf0.1 documents) and would serialize the whole
    // fingerprint pass on one core (StageProfile: 2.1 s single-task
    // stage). At 100 TB scans are naturally multi-partition and this is
    // a no-op; locally it spreads the decode at the cost of shuffling
    // the (small) payloads once.
    val spread =
      if (media.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        media.repartition(spark.sparkContext.defaultParallelism)
      else media
    spread.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      // window boundaries land on codec frame boundaries (frameBytes) —
      // proportional BYTE offsets would slice 16-bit PCM mid-sample and
      // destroy gain covariance (caught by the m08 WAV spec)
      val fb = sess.frameBytes
      it.map { m =>
        // frame count over the DECODED stream (planeLength), not the
        // container: a WAV header would shift every window and silence
        // the tail, and the same PCM re-containered (AU/AIFF) would
        // fingerprint differently — container-invariance is spec-pinned
        val nf = sess.planeLength(m.payload).toLong / fb
        val energies = Array.tabulate(horizon) { wi =>
          val startF = wi * nf / horizon
          val endF = ((wi + 2) * nf / horizon).min(nf)
          sess.feature(sess.slice(m.payload,
            (startF * fb).toInt, ((endF - startF) * fb).toInt)._1)
        }
        val bits = new java.lang.StringBuilder(horizon - 1)
        var i = 0
        while (i < horizon - 1) {
          bits.append(if (energies(i + 1) > energies(i)) '1' else '0')
          i += 1
        }
        (m.doc_id, bits.toString)
      }
    }.toDF("doc_id", "ahash")
  }

  /** Audio near-dup grouping — [[audioFingerprint]]'s energy-delta key
    * through [[perceptualNeighbors]]' banded Hamming machinery: the audio
    * twin of m06 (re-encoded/volume-shifted clips keep their energy
    * PROFILE — delta signs are invariant to uniform gain — so they land
    * within a few flipped bits). The DuckDB oracle re-derives the
    * fingerprint from the ASCII byte==char identity and brute-forces all
    * distinct-fingerprint pairs — banding-free, so it independently
    * proves the pigeonhole completeness exactly as m06's oracle does. */
  val m08 = QueryDef(
    "m08_audio_neardup",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      perceptualNeighbors(s, audioFingerprint(s, media))
    },
    Some(s"""
      WITH ${oAudioFpCtes("b", "en", "h", "ahash")},
      dh AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS canonical_doc
             FROM h GROUP BY ahash),
      ed AS (SELECT a.ahash AS ahash, b.n_docs AS other_docs,
              len(list_filter(range(1, 65),
                i -> substring(a.ahash, i, 1) <> substring(b.ahash, i, 1))) AS ham
            FROM dh a JOIN dh b ON a.ahash <> b.ahash),
      nb AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_neighbor_hashes,
               CAST(sum(other_docs) AS BIGINT) AS n_neighbor_docs
             FROM ed WHERE ham <= $m06MaxHam GROUP BY ahash)
      SELECT dh.ahash, dh.n_docs, dh.canonical_doc,
             CAST(coalesce(nb.n_neighbor_hashes, 0) AS BIGINT) AS n_neighbor_hashes,
             CAST(coalesce(nb.n_neighbor_docs, 0) AS BIGINT) AS n_neighbor_docs
      FROM dh LEFT JOIN nb ON dh.ahash = nb.ahash"""),
    headline = true)

  // ---- content-defined audio granules (m10) ---------------------------

  /** m10 geometry. Landmark pattern: a cut lands after frame i when the
    * last 5 energy-delta SIGNS read 1,0,1,0,1 — expected spacing 2^5 = 32
    * frames on sign-balanced content. Granules shorter than
    * `m10MinFrames` frames are dropped. 33 fingerprint windows → 32 key
    * bits: the 17-window (16-bit) geometry was measured FIRST and
    * rejected — at 64× its key space aliased unrelated granule contents
    * 8:1 (9,376 distinct keys for 74,444 distinct granule CONTENTS) and
    * blew the candidate-pair load to 940 M where the content-true floor
    * is 82 M; 32 bits restores content-level selectivity (for granules
    * shorter than 33 frames some windows are zero-width — lower entropy,
    * still deterministic and content-exact on both engines).
    * `m10MaxKeyClasses` is the skew backstop (the stop-landmark idea
    * production audio matchers apply to over-common landmarks): a key
    * held by more classes is dropped as non-identifying before the pair
    * join, bounding any single bucket's quadratic cost. At the measured
    * 64× corpus the cap drops 25 of 74 k keys and none of the ~64-class
    * sibling groups the salted corpus plants (SCALE.md m10). */
  private[graft] val m10MinFrames = 17
  private[graft] val m10FpWindows = 33
  private[graft] val m10MaxKeyClasses = 512

  /** Content-defined audio granule keys: the alignment-robust matching
    * signal the round-10 verdict asked for. The proportional-grid global
    * fingerprint ([[audioFingerprint]]) decorrelates under a one-token
    * edit because EVERY window boundary is a fraction of total length
    * (measured min Hamming 19 on true pairs, SCALE.md) — and a single
    * best-offset search cannot repair a MIDDLE insertion either (the
    * prefix aligns at offset 0, the suffix at ±k; no global shift fits
    * both). Production matchers anchor analysis to CONTENT landmarks, so
    * an edit stays local: here a granule boundary is cut wherever the
    * last 5 delta-sign bits of the frame-energy stream match `10101`
    * (delta SIGNS, not raw energies, so boundaries — like the granule
    * fingerprints — are invariant to uniform gain). An insertion
    * corrupts only the granule containing it (and possibly its
    * neighbor); every other granule's bytes, boundaries, and fingerprint
    * are untouched, so near-dups keep a majority of granule keys in
    * common no matter WHERE the edit lands.
    *
    * Per granule (≥ [[m10MinFrames]] frames): [[m10FpWindows]] (33)
    * proportional 50%-overlap windows within the granule → 32
    * energy-delta sign bits; key = `"<frameLen>:<bits>"` (the 17-window/
    * 16-bit variant was measured and REJECTED — 8:1 key aliasing, 940 M
    * candidate pairs; see the constants' doc block). Keys are
    * exact-join tokens — candidate
    * generation is an equi-join (banding degenerates to exact matching;
    * no Hamming search, no cross join). Returns the payload's decoded
    * content digest (class key) plus the DISTINCT granule keys.
    *
    * Semantics are frame-aligned through the [[MediaCodec]] seam (frame
    * energies via `feature` over single frames of the decoded plane) —
    * the stub's byte==frame identity makes the whole chain one SQL
    * spelling ([[oGranuleCtes]]). */
  private[graft] def granuleKeys(
      sess: MediaCodec.Session, payload: Array[Byte]): (String, Array[String]) = {
    val fb = sess.frameBytes
    val planeLen = sess.planeLength(payload)
    val (plane, digest) = sess.slice(payload, 0, planeLen)
    val nf = plane.length / fb
    val scratch = new Array[Byte](fb)
    val e = new Array[Long](nf)
    var i = 0
    while (i < nf) {
      System.arraycopy(plane, i * fb, scratch, 0, fb)
      e(i) = sess.feature(scratch)
      i += 1
    }
    @inline def dSign(j: Int): Boolean = e(j + 1) > e(j)
    // window energy = SUM of per-frame energies over the window's frames
    // (frame-additive by DEFINITION of this chain — both shipped codec
    // features, byte sum and |sample| sum, are additive across frames,
    // and the DuckDB oracle spells window energy as the same plain sum),
    // so one prefix-sum array answers every window in O(1) instead of
    // re-reading each granule's bytes ~2× through 33 allocated copies
    // (review finding: this is m09/m10's per-row hot path)
    val pre = new Array[Long](nf + 1)
    i = 0
    while (i < nf) { pre(i + 1) = pre(i) + e(i); i += 1 }
    val keys = scala.collection.mutable.LinkedHashSet.empty[String]
    def emit(gs: Int, ge: Int): Unit = {
      val gl = ge - gs + 1
      if (gl >= m10MinFrames) {
        val en = new Array[Long](m10FpWindows)
        var wi = 0
        while (wi < m10FpWindows) {
          val s0 = wi * gl / m10FpWindows
          val e0 = math.min((wi + 2) * gl / m10FpWindows, gl)
          en(wi) = pre(gs + e0) - pre(gs + s0)
          wi += 1
        }
        val bits = new java.lang.StringBuilder(m10FpWindows - 1)
        var k = 0
        while (k < m10FpWindows - 1) {
          bits.append(if (en(k + 1) > en(k)) '1' else '0')
          k += 1
        }
        keys += s"$gl:$bits"
      }
    }
    var start = 0
    i = 4 // first frame where 5 delta bits exist behind it
    while (i <= nf - 2) {
      if (dSign(i - 4) && !dSign(i - 3) && dSign(i - 2) && !dSign(i - 1) &&
          dSign(i)) {
        emit(start, i)
        start = i + 1
      }
      i += 1
    }
    if (nf > 0) emit(start, nf - 1)
    (digest, keys.toArray)
  }

  /** Binary-payload frame → `(doc_id, dg, gkeys)`: content digest (the
    * duplicate-class key) plus distinct granule keys, one row per doc.
    * ZERO shuffles — same row-wise economics (and small-scan spread) as
    * [[audioFingerprint]]. */
  def audioGranules(spark: SparkSession, media: DataFrame,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    val spread =
      if (media.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        media.repartition(spark.sparkContext.defaultParallelism)
      else media
    spread.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      it.map { m =>
        val (dg, keys) = granuleKeys(sess, m.payload)
        (m.doc_id, dg, keys)
      }
    }.toDF("doc_id", "dg", "gkeys")
  }

  /** ONE corpus decode for m09: image aHash + audio fingerprint +
    * granule class/keys computed in a single `mapPartitions` pass.
    * Round-11's m09 ran [[perceptualHash]], [[audioFingerprint]] and
    * [[audioGranules]] as three independent passes and re-joined them on
    * doc_id — three corpus scans/decodes (~5.5 s EACH at 64×, and the
    * image pass inherited the scan's 1–2 partitions, serializing its
    * compute) plus two join shuffles, all to rebuild a frame this pass
    * emits directly. Feature spellings are byte-for-byte those of the
    * three standalone helpers (their oracles pin them); the standalone
    * helpers stay the single-signal building blocks for m05/m06/m08/m10. */
  private[graft] def mediaFeatures(spark: SparkSession, media: DataFrame,
      srcW: Int = 32, horizon: Int = 65,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    val spread =
      if (media.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        media.repartition(spark.sparkContext.defaultParallelism)
      else media
    spread.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      val fb = sess.frameBytes
      it.map { m =>
        // image aHash ([[perceptualHash]]'s spelling)
        val px = sess.resize(m.payload, srcW, 8, 8)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        val ibits = new Array[Char](px.length)
        i = 0
        while (i < px.length) {
          ibits(i) = if (px(i).toLong * 64L > sum) '1' else '0'
          i += 1
        }
        // audio fingerprint ([[audioFingerprint]]'s spelling)
        val nf = sess.planeLength(m.payload).toLong / fb
        val energies = Array.tabulate(horizon) { wi =>
          val startF = wi * nf / horizon
          val endF = ((wi + 2) * nf / horizon).min(nf)
          sess.feature(sess.slice(m.payload,
            (startF * fb).toInt, ((endF - startF) * fb).toInt)._1)
        }
        val abits = new java.lang.StringBuilder(horizon - 1)
        i = 0
        while (i < horizon - 1) {
          abits.append(if (energies(i + 1) > energies(i)) '1' else '0')
          i += 1
        }
        // content class + granule keys ([[granuleKeys]])
        val (dg, keys) = granuleKeys(sess, m.payload)
        (m.doc_id, new String(ibits), abits.toString, dg, keys)
      }
    }.toDF("doc_id", "ihash", "afp", "dg", "gkeys")
  }

  /** DuckDB spelling of the granule chain over the stub's byte==frame
    * identity, ending at `gkName(doc_id, gkey)` (DISTINCT keys per doc) —
    * ONE spelling shared by the m10 and m09 oracles so they cannot
    * drift. 1-based byte positions mirror the engine's 0-based frames
    * (engine frame i ↔ byte p = i+1); cut after byte p ∈ [5, n-1] iff
    * delta signs d[p-4..p] = 1,0,1,0,1 with d[k] = (ascii(k+1) >
    * ascii(k)); final cut at n. */
  private def oGranuleCtes(pfx: String, gkName: String): String = s"""
      ${pfx}d AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n,
               list_transform(range(1, CAST(strlen(text) AS BIGINT)), p ->
                 CASE WHEN ascii(substring(text, CAST(p + 1 AS INT), 1)) >
                           ascii(substring(text, CAST(p AS INT), 1))
                      THEN 1 ELSE 0 END) AS dl
             FROM documents),
      ${pfx}c AS (SELECT doc_id, text,
               list_append(list_filter(range(5, n), p ->
                 dl[CAST(p - 4 AS INT)] = 1 AND dl[CAST(p - 3 AS INT)] = 0 AND
                 dl[CAST(p - 2 AS INT)] = 1 AND dl[CAST(p - 1 AS INT)] = 0 AND
                 dl[CAST(p AS INT)] = 1), n) AS cuts
             FROM ${pfx}d),
      ${pfx}g AS (SELECT doc_id, text,
               CASE WHEN k = 1 THEN CAST(1 AS BIGINT)
                    ELSE cuts[CAST(k - 1 AS INT)] + 1 END AS gs,
               cuts[CAST(k AS INT)] AS ge
             FROM (SELECT doc_id, text, cuts,
                     unnest(range(1, len(cuts) + 1)) AS k
                   FROM ${pfx}c)),
      ${pfx}e AS (SELECT doc_id, ge - gs + 1 AS gl,
               list_transform(range(0, $m10FpWindows), wi ->
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                     range(gs + (wi * (ge - gs + 1)) // $m10FpWindows,
                           gs + least(((wi + 2) * (ge - gs + 1)) // $m10FpWindows,
                                      ge - gs + 1)),
                     p -> CAST(ascii(substring(text, CAST(p AS INT), 1)) AS BIGINT))),
                   (a, c) -> a + c)) AS en
             FROM ${pfx}g WHERE ge - gs + 1 >= $m10MinFrames),
      $gkName AS (SELECT DISTINCT doc_id,
               gl || ':' || array_to_string(
                 list_transform(range(0, ${m10FpWindows - 1}), i ->
                   CASE WHEN en[CAST(i + 2 AS INT)] > en[CAST(i + 1 AS INT)]
                        THEN '1' ELSE '0' END), '') AS gkey
             FROM ${pfx}e)"""

  /** m10 match rule: classes match when they share at least 2 granule
    * keys AND at least half of the smaller side's keys. ONE spelling —
    * [[oGranuleMatchSql]] — drives the engine SQL, both oracles, and
    * (via this Scala twin, spec-pinned) the test-side checks, so the
    * shipped threshold cannot drift from the documented rule. */
  private[graft] def granuleMatched(shared: Long, na: Long, nb: Long): Boolean =
    shared >= 2 && 2 * shared >= math.min(na, nb)

  /** SQL spelling of [[granuleMatched]], valid in Spark SQL and DuckDB. */
  private[graft] def oGranuleMatchSql(c: String, na: String, nb: String): String =
    s"($c >= 2 AND 2 * $c >= least($na, $nb))"

  /** Alignment-robust audio near-dup via content-defined granules — the
    * production answer to [[audioFingerprint]]'s measured alignment
    * sensitivity (a one-token edit decorrelates the proportional global
    * grid; SCALE.md m09). Per duplicate-class (decoded-content digest):
    * its size, canonical doc, granule count, and the classes it matches
    * under [[granuleMatched]] — matching is a granule-key EQUI-join
    * (distinct-class collapse first, exact keys, no Hamming search), so
    * candidates stay bucketed at any corpus size. The DuckDB oracle
    * re-derives granules from the byte==frame identity and counts the
    * same shared keys — an independent end-to-end derivation. */
  val m10 = QueryDef(
    "m10_audio_granule_neardup",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      // class collapse BEFORE the key join (m06's rule): one row per
      // distinct decoded content, metadata-width, staged (cached) so the
      // three consumers below never re-run the scan+granulate pass.
      // r17: staged cache instead of an eager localCheckpoint — same
      // build-once guarantee (direct DataFrame reuse, so the fragment
      // match is exact), but materialization folds into the first
      // consuming job instead of a separate barrier job, and the cache
      // PRESERVES output partitioning where the checkpoint leaf
      // surfaced UnknownPartitioning (StageProfile r17: the two
      // checkpoint barriers alone were ~0.9 s of m10's 3.8 s at sf0.1)
      val cls = staged("m10_cls", d) {
        audioGranules(s, media)
          .groupBy($"dg")
          .agg(min($"doc_id").as("canonical_doc"),
            count(lit(1)).as("n_docs"), first($"gkeys").as("gkeys"))
      }
      // pin the exchange key + count: the key frame is tiny but the join
      // OUTPUT is the candidate explosion (m08's AQE coalesce trap)
      val ck0 = cls.select($"dg", explode($"gkeys").as("gkey"))
        .repartition(s.sparkContext.defaultParallelism, $"gkey")
      // stop-landmark skew backstop: keys held by > m10MaxKeyClasses
      // classes are non-identifying; dropping them bounds the worst
      // bucket's quadratic pair cost (metadata-width window count —
      // ck0 is already partitioned by gkey, so no extra exchange)
      // staged: ck feeds the denominators and BOTH self-join sides;
      // left lazy, the explode + pinned exchange + skew-cap window
      // re-ran per reference (PlanAudit: 9 live Generates). The cached
      // frame keeps ck0's gkey hash-partitioning, so the self-join
      // below needs NO further exchange (the r16 checkpoint leaf lost
      // it and the join re-shuffled both sides at scale)
      val ck = roundCheckpoint(ck0.withColumn("kc",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy($"gkey")))
        .where($"kc" <= m10MaxKeyClasses).drop("kc"))
      // denominators count INFORMATIVE (kept) keys, consistently with
      // the shared counts the rule compares them to
      val ng = ck.groupBy($"dg").agg(count(lit(1)).as("n_g"))
      val sh = ck.as("a")
        .join(ck.as("b"), $"a.gkey" === $"b.gkey" && $"a.dg" < $"b.dg")
        .groupBy($"a.dg".as("da"), $"b.dg".as("db"))
        .agg(count(lit(1)).as("c"))
      val mt = sh
        .join(ng.select($"dg".as("da"), $"n_g".as("na")), "da")
        .join(ng.select($"dg".as("db"), $"n_g".as("nb")), "db")
        .where(org.apache.spark.sql.functions.expr(
          oGranuleMatchSql("c", "na", "nb")))
        .select($"da", $"db")
      // both directions in one pass over mt (see perceptualNeighbors)
      val ed = mt.select(explode(expr(
          "array(struct(da AS dg, db AS other), " +
          "struct(db AS dg, da AS other))")).as("e"))
        .select($"e.dg", $"e.other")
      val nbv = ed
        .join(cls.select($"dg".as("other"), $"n_docs".as("od")), "other")
        .groupBy($"dg")
        .agg(count(lit(1)).as("n_matched_classes"),
          sum($"od").as("n_matched_docs"))
      cls.join(ng, Seq("dg"), "left").join(nbv, Seq("dg"), "left")
        .select($"canonical_doc", $"n_docs",
          coalesce($"n_g", lit(0L)).as("n_granules"),
          coalesce($"n_matched_classes", lit(0L)).as("n_matched_classes"),
          coalesce($"n_matched_docs", lit(0L)).as("n_matched_docs"))
    },
    Some(s"""
      WITH ${oGranuleCtes("g", "gk")},
      cls AS (SELECT md5(text) AS dg, min(doc_id) AS canonical_doc,
                CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY md5(text)),
      ck0 AS (SELECT c.dg, g.gkey
              FROM cls c JOIN gk g ON g.doc_id = c.canonical_doc),
      ck AS (SELECT dg, gkey FROM (SELECT dg, gkey,
               count(*) OVER (PARTITION BY gkey) AS kc FROM ck0)
             WHERE kc <= $m10MaxKeyClasses),
      ng AS (SELECT dg, CAST(count(*) AS BIGINT) AS n_g FROM ck GROUP BY dg),
      sh AS (SELECT a.dg AS da, b.dg AS db, CAST(count(*) AS BIGINT) AS c
             FROM ck a JOIN ck b ON a.gkey = b.gkey AND a.dg < b.dg
             GROUP BY 1, 2),
      mt AS (SELECT da, db FROM sh
             JOIN ng na ON sh.da = na.dg JOIN ng nb ON sh.db = nb.dg
             WHERE ${oGranuleMatchSql("c", "na.n_g", "nb.n_g")}),
      ed AS (SELECT da AS dg, db AS other FROM mt
             UNION ALL SELECT db, da FROM mt),
      nbv AS (SELECT ed.dg, CAST(count(*) AS BIGINT) AS n_matched_classes,
                CAST(sum(c2.n_docs) AS BIGINT) AS n_matched_docs
              FROM ed JOIN cls c2 ON ed.other = c2.dg GROUP BY ed.dg)
      SELECT cls.canonical_doc, cls.n_docs,
             CAST(coalesce(ng.n_g, 0) AS BIGINT) AS n_granules,
             CAST(coalesce(nbv.n_matched_classes, 0) AS BIGINT) AS n_matched_classes,
             CAST(coalesce(nbv.n_matched_docs, 0) AS BIGINT) AS n_matched_docs
      FROM cls LEFT JOIN ng ON cls.dg = ng.dg
               LEFT JOIN nbv ON cls.dg = nbv.dg"""),
    headline = true)

  /** Cross-modal consensus dedup — the multi-signal verdict a production
    * dedup pipeline ships to cut false positives: every text near-dup
    * CANDIDATE pair (d02's MinHash/LSH, jaccard ≥ 0.8) is corroborated
    * against two independent perceptual signals on the same payloads —
    * the image aHash (88% of true text near-dups within m06MaxHam bits,
    * measured at sf0.01) and, since round 11, the AUDIO signal as a
    * GATING input: content-defined granule overlap ([[granuleKeys]] —
    * 84% of true pairs matched at sf0.01), which is alignment-robust
    * where the m08 global fingerprint is not. The global fingerprint's
    * Hamming stays reported as `ham_audio` (the m08 grouping signal and
    * the measured illustration of WHY granules are needed: a
    * single-token edit shifts every proportional window span,
    * decorrelating the deltas — min Hamming 19 across true pairs).
    * `consensus` = image within tolerance AND audio granule match
    * (same decoded content, or ≥ 2 shared granule keys covering ≥ half
    * of the smaller side — [[granuleMatched]]).
    *
    * Scale shape: the candidate set is d02's (band-joined, small
    * relative to the corpus but DATA-DEPENDENT — a duplication-heavy
    * corpus can produce a fat pair set); the per-doc feature frame
    * (64-bit image key + 64-bit audio key) is computed ONCE,
    * checkpointed, and the pair frame joins it twice by doc id. The
    * join strategy is deliberately left to AQE's runtime size decision:
    * a pinned broadcast hint OOM'd the driver at 64× (the checkpointed
    * feature frame landed on the broadcast side), while AQE broadcasts
    * whichever side is actually small and falls back to a shuffle join
    * — same logical plan — when neither is. */
  val m09 = QueryDef(
    "m09_crossmodal_consensus",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      // ONE decode pass for all three signals (see [[mediaFeatures]]) —
      // round 11 paid three corpus passes plus two doc_id join shuffles
      val feats = roundCheckpoint(mediaFeatures(s, media))
      val pairs = graft.ops.DedupOps.d02.run(s, d)
        .select($"doc_a", $"doc_b", $"jaccard")
      val withA = feats.as("fa")
        .join(pairs.as("p"), $"fa.doc_id" === $"p.doc_a")
        .select($"p.doc_a", $"p.doc_b", $"p.jaccard",
          $"fa.ihash".as("ia"), $"fa.afp".as("aa"),
          $"fa.dg".as("dga"), $"fa.gkeys".as("ga"))
      val withB = feats.as("fb")
        .join(withA.as("x"), $"fb.doc_id" === $"x.doc_b")
        .select($"x.doc_a", $"x.doc_b", $"x.jaccard",
          expr(sHam64("x.ia", "fb.ihash")).as("ham_image"),
          expr(sHam64("x.aa", "fb.afp")).as("ham_audio"),
          ($"x.dga" === $"fb.dg").as("same_audio"),
          size(array_intersect($"x.ga", $"fb.gkeys")).cast("long")
            .as("audio_shared"),
          least(size($"x.ga"), size($"fb.gkeys")).cast("long").as("min_g"))
      withB
        .withColumn("audio_match", $"same_audio" ||
          expr(oGranuleMatchSql("audio_shared", "min_g", "min_g")))
        .withColumn("consensus",
          $"ham_image" <= lit(m06MaxHam) && $"audio_match")
        .drop("same_audio", "min_g")
    },
    Some(s"""
      WITH pairs AS (SELECT * FROM (${graft.ops.DedupOps.d02.oracle.get})),
      $oAHashCtes,
      ${oAudioFpCtes("ab", "aen", "ah", "afp")},
      ${oGranuleCtes("cg", "cgk")},
      ddg AS (SELECT doc_id, md5(text) AS dg FROM documents),
      ngd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_g
              FROM cgk GROUP BY doc_id),
      sh2 AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS c
              FROM pairs p
              JOIN cgk ga2 ON ga2.doc_id = p.doc_a
              JOIN cgk gb2 ON gb2.doc_id = p.doc_b AND ga2.gkey = gb2.gkey
              GROUP BY 1, 2),
      j AS (SELECT p.doc_a, p.doc_b, p.jaccard,
              CAST(len(list_filter(range(1, 65),
                i -> substring(ia.ahash, i, 1) <> substring(ib.ahash, i, 1)))
                AS BIGINT) AS ham_image,
              CAST(len(list_filter(range(1, 65),
                i -> substring(aa.afp, i, 1) <> substring(bb.afp, i, 1)))
                AS BIGINT) AS ham_audio,
              CAST(coalesce(s.c, 0) AS BIGINT) AS audio_shared,
              (da.dg = db.dg) OR ${oGranuleMatchSql("coalesce(s.c, 0)",
                "coalesce(na.n_g, 0)", "coalesce(nb.n_g, 0)")}
                AS audio_match
            FROM pairs p
            JOIN h ia ON p.doc_a = ia.doc_id
            JOIN h ib ON p.doc_b = ib.doc_id
            JOIN ah aa ON p.doc_a = aa.doc_id
            JOIN ah bb ON p.doc_b = bb.doc_id
            JOIN ddg da ON p.doc_a = da.doc_id
            JOIN ddg db ON p.doc_b = db.doc_id
            LEFT JOIN sh2 s ON p.doc_a = s.doc_a AND p.doc_b = s.doc_b
            LEFT JOIN ngd na ON p.doc_a = na.doc_id
            LEFT JOIN ngd nb ON p.doc_b = nb.doc_id)
      SELECT doc_a, doc_b, jaccard, ham_image, ham_audio, audio_shared,
             audio_match,
             ham_image <= $m06MaxHam AND audio_match AS consensus
      FROM j"""))

  final case class ShotMeta(doc_id: Long, shot_idx: Long, start_frame: Long,
      n_frames: Long, energy_sum: Long, key_frame_idx: Long,
      key_frame_md5: String)

  /** Shot-boundary sensitivity dial: a cut fires when the per-byte frame
    * feature jumps by more than 1/`shotSensitivity` of the larger side
    * (`-Dgraft.shot.sensitivity`, default 16 → a 6.25% relative jump).
    * Measured on the gate corpus: 16 yields 64 cuts over 2640 frames at
    * sf0.001 (healthy segmentation); 4 (25%) fires zero cuts, 32 (~3%)
    * fires on 18% of frames (chatter). */
  private[graft] val shotSensitivity =
    sys.props.getOrElse("graft.shot.sensitivity", "16").toLong

  /** Shot-boundary detection + keyframe selection — the video
    * preprocessing stage a multimodal training pipeline runs before
    * captioning/sampling (PySceneDetect's content-detector shape: a cut
    * where the inter-frame feature delta exceeds a threshold, then one
    * representative keyframe per shot). Frames are consecutive
    * `frameBytes`-byte slices of the DECODED plane (m02's video-frame
    * grid, stride = frame size — segmentation needs every consecutive
    * delta, not m02's every-Nth sample); the per-frame feature is the
    * codec's scalar (stub: exact unsigned-byte sum — the luma-mean
    * stand-in), length-normalized to per-full-frame scale so the short
    * tail frame can't fake a cut (`feat·frameBytes div len`). The cut
    * rule is RELATIVE — `sens·|Δ| > max(prev, cur)` — so it is invariant
    * to global intensity scaling (a brighter encode of the same video
    * cuts identically), the same reason m08/m10 use delta SIGNS. Per
    * shot: frame span, energy sum, and the argmax-feature keyframe
    * (first-frame tie-break) with its content digest — the frame a
    * captioner/sampler would take.
    *
    * Scale shape: ONE row-wise flatMap behind the per-partition codec
    * session — zero shuffles, zero joins; per-doc state is one frame's
    * features at a time plus the current shot accumulator (bounded by
    * document length, never corpus-scale). d14's ideal-map-pass
    * economics. */
  def detectShots(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 64, sensitivity: Long = shotSensitivity,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      // frame size aligned to the codec's sample granularity (a 16-bit
      // PCM plane must not slice mid-sample — m10's geometry rule)
      val fb = math.max(frameBytes / sess.frameBytes, 1) * sess.frameBytes
      it.flatMap { m =>
        val len = sess.planeLength(m.payload)
        val n = (len + fb - 1) / fb
        if (n == 0) Iterator.empty
        else {
          val feats = new Array[Long](n)
          val scaled = new Array[Long](n)
          val md5s = new Array[String](n)
          var i = 0
          while (i < n) {
            val (bytes, hex) = sess.slice(m.payload, i * fb, fb)
            feats(i) = sess.feature(bytes)
            md5s(i) = hex
            scaled(i) = feats(i) * fb / math.max(bytes.length, 1)
            i += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[ShotMeta]
          var shotStart = 0
          var shot = 0L
          def emit(endExcl: Int): Unit = {
            var e = 0L
            var kf = shotStart
            var j = shotStart
            while (j < endExcl) {
              e += feats(j)
              if (feats(j) > feats(kf)) kf = j
              j += 1
            }
            out += ShotMeta(m.doc_id, shot, shotStart.toLong,
              (endExcl - shotStart).toLong, e, kf.toLong, md5s(kf))
            shot += 1
          }
          i = 1
          while (i < n) {
            val a = scaled(i - 1)
            val b = scaled(i)
            if (sensitivity * math.abs(b - a) > math.max(a, b)) {
              emit(i); shotStart = i
            }
            i += 1
          }
          emit(n)
          out.iterator
        }
      }
    }.toDF()
  }

  /** Oracle: ASCII payloads — the stub's plane is the text itself, so
    * frame features and digests replicate in SQL (m03's spelling), and
    * the shot segmentation is a lag + running-sum-of-cuts window. */
  val m11 = QueryDef(
    "m11_shot_detection",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      detectShots(s, media)
    },
    Some(s"""
      WITH b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
                 FROM documents WHERE strlen(text) > 0),
      f AS (SELECT doc_id, text, len,
              unnest(range(0, (len + 63) // 64)) AS fi FROM b),
      sub AS (SELECT doc_id, fi,
                substring(text, CAST(fi * 64 + 1 AS INT), 64) AS fr FROM f),
      e AS (SELECT doc_id, fi, CAST(length(fr) AS BIGINT) AS flen,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(fr) + 1),
                  i -> CAST(ascii(substring(fr, i, 1)) AS BIGINT))),
                (a, c) -> a + c) AS BIGINT) AS feat,
              md5(fr) AS fmd5
            FROM sub),
      g AS (SELECT doc_id, fi, feat, fmd5, (feat * 64) // flen AS sc FROM e),
      c AS (SELECT doc_id, fi, feat, fmd5, sc,
              CASE WHEN lag(sc) OVER w IS NULL THEN 0
                   WHEN $shotSensitivity * abs(sc - lag(sc) OVER w)
                        > greatest(sc, lag(sc) OVER w) THEN 1
                   ELSE 0 END AS cut
            FROM g WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
      st AS (SELECT doc_id, fi, feat, fmd5,
               sum(cut) OVER (PARTITION BY doc_id ORDER BY fi) AS shot_idx
             FROM c),
      k AS (SELECT doc_id, fi, feat, fmd5, shot_idx,
              row_number() OVER (PARTITION BY doc_id, shot_idx
                ORDER BY feat DESC, fi) AS rk
            FROM st)
      SELECT doc_id,
             CAST(shot_idx AS BIGINT) AS shot_idx,
             CAST(min(fi) AS BIGINT) AS start_frame,
             CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(feat) AS BIGINT) AS energy_sum,
             CAST(max(CASE WHEN rk = 1 THEN fi END) AS BIGINT) AS key_frame_idx,
             max(CASE WHEN rk = 1 THEN fmd5 END) AS key_frame_md5
      FROM k GROUP BY doc_id, shot_idx"""),
    headline = true)

  final case class VadMeta(doc_id: Long, seg_idx: Long, start_frame: Long,
      n_frames: Long, seg_energy: Long)

  /** Activity margin in percent over the document's mean frame energy
    * (`-Dgraft.vad.margin`): a frame is ACTIVE iff its length-normalized
    * energy is ≥ (100+margin)% of the doc mean. 0 = "above own mean" —
    * the classic energy-gate VAD baseline; the dial exists because real
    * speech corpora tune the gate to their noise floor. */
  private[graft] val vadMargin = sys.props.getOrElse("graft.vad.margin", "0").toLong

  /** Voice-activity segmentation — the silence-trimming stage a speech
    * pipeline runs before transcription/alignment (energy-gate VAD,
    * the webrtcvad/SAD baseline shape): frames whose energy clears a
    * DOC-RELATIVE threshold are active, and maximal runs of active
    * frames become the speech segments a forced aligner or ASR stage
    * consumes. The threshold is relative to the document's own mean
    * ([[vadMargin]]) so a quiet recording segments the same as a loud
    * one — m11's scaling-invariance argument, applied to the gate level
    * rather than the delta. Frame energies are length-normalized to
    * per-full-frame scale (the m11 tail rule) and the activity compare
    * is exact integer cross-multiplication (scaled·n·100 ≥
    * total·(100+margin)) — no division, bit-identical in SQL.
    *
    * Scale shape: ONE row-wise flatMap behind the per-partition codec
    * session — zero shuffles; per-doc state is the frame-feature array
    * (bounded by document length). m11/d14's ideal-map-pass economics. */
  def detectSpeech(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 48, marginPct: Long = vadMargin,
      codec: MediaCodec = MediaCodec.Stub): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      val sess = codec.open()
      val fb = math.max(frameBytes / sess.frameBytes, 1) * sess.frameBytes
      it.flatMap { m =>
        val len = sess.planeLength(m.payload)
        val n = (len + fb - 1) / fb
        if (n == 0) Iterator.empty
        else {
          val feats = new Array[Long](n)
          val scaled = new Array[Long](n)
          var tot = 0L
          var i = 0
          while (i < n) {
            val (bytes, _) = sess.slice(m.payload, i * fb, fb)
            feats(i) = sess.feature(bytes)
            scaled(i) = feats(i) * fb / math.max(bytes.length, 1)
            tot += scaled(i)
            i += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[VadMeta]
          var seg = 0L
          var segStart = -1
          var segE = 0L
          i = 0
          while (i < n) {
            val active = scaled(i) * n * 100L >= tot * (100L + marginPct)
            if (active) {
              if (segStart < 0) { segStart = i; segE = 0L }
              segE += feats(i)
            } else if (segStart >= 0) {
              out += VadMeta(m.doc_id, seg, segStart.toLong,
                (i - segStart).toLong, segE)
              seg += 1
              segStart = -1
            }
            i += 1
          }
          if (segStart >= 0)
            out += VadMeta(m.doc_id, seg, segStart.toLong,
              (n - segStart).toLong, segE)
          out.iterator
        }
      }
    }.toDF()
  }

  /** Oracle: m11's frame spelling + the activity gate as the same integer
    * cross-multiplication, runs via lag-head + running-sum-of-heads over
    * active frames only (coverageTail's span idiom). */
  val m12 = QueryDef(
    "m12_speech_segments",
    (s, d) => {
      import s.implicits._
      val media = table(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      detectSpeech(s, media)
    },
    Some(s"""
      WITH b AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len
                 FROM documents WHERE strlen(text) > 0),
      f AS (SELECT doc_id, text, len,
              unnest(range(0, (len + 47) // 48)) AS fi FROM b),
      sub AS (SELECT doc_id, fi,
                substring(text, CAST(fi * 48 + 1 AS INT), 48) AS fr FROM f),
      e AS (SELECT doc_id, fi, CAST(length(fr) AS BIGINT) AS flen,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(fr) + 1),
                  i -> CAST(ascii(substring(fr, i, 1)) AS BIGINT))),
                (a, c) -> a + c) AS BIGINT) AS feat
            FROM sub),
      g AS (SELECT doc_id, fi, feat, (feat * 48) // flen AS sc FROM e),
      t AS (SELECT doc_id, fi, feat, sc,
              count(*) OVER (PARTITION BY doc_id) AS nf,
              sum(sc) OVER (PARTITION BY doc_id) AS tot
            FROM g),
      a AS (SELECT doc_id, fi, feat,
              CASE WHEN sc * nf * 100 >= tot * (100 + $vadMargin)
                   THEN 1 ELSE 0 END AS act
            FROM t),
      h AS (SELECT doc_id, fi, feat, act,
              CASE WHEN act = 1 AND coalesce(lag(act) OVER
                (PARTITION BY doc_id ORDER BY fi), 0) = 0
              THEN 1 ELSE 0 END AS head
            FROM a),
      r AS (SELECT doc_id, fi, feat, act,
              sum(head) OVER (PARTITION BY doc_id ORDER BY fi) AS seg1
            FROM h)
      SELECT doc_id,
             CAST(seg1 - 1 AS BIGINT) AS seg_idx,
             CAST(min(fi) AS BIGINT) AS start_frame,
             CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(feat) AS BIGINT) AS seg_energy
      FROM r WHERE act = 1 GROUP BY doc_id, seg1"""),
    headline = true)

  val all: Seq[QueryDef] =
    Seq(m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11, m12)
}
