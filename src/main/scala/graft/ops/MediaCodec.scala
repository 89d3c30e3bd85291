package graft.ops

/** Pluggable media codec for the multimodal operators (m01-m03).
  *
  * The operators' Spark-side plumbing — binary payload columns, typed
  * encoders, per-partition batching, row-wise flatMap with no shuffle —
  * is deployment-independent; the only thing a real deployment changes is
  * HOW bytes are decoded. That seam is this trait: an operator calls
  * [[MediaCodec.open]] exactly once per partition (the expensive step —
  * loading a native decoder, mmap'ing a model, allocating reusable frame
  * buffers; mirrors `Worker::bootstrap`,
  * `/root/reference/gasket/src/framework.rs:103`) and streams the
  * partition's rows through the returned [[MediaCodec.Session]].
  *
  * The default [[MediaCodec.Stub]] is a deterministic pure-function fake
  * (this container ships no image/audio libraries): metadata derives from
  * payload length, "frame decoding" is byte slicing, the content digest
  * is MD5, and the "spectral feature" is the unsigned byte sum. Every
  * stub output is expressible in SQL, which is what keeps m01-m03
  * oracle-checkable end to end. A deployment drops in its own factory
  * (e.g. JNI FFmpeg / ImageIO) and none of the operators change.
  */
trait MediaCodec extends Serializable {
  /** Called once per partition, on the executor. */
  def open(): MediaCodec.Session
}

object MediaCodec {

  /** Per-partition codec state. NOT thread-safe by contract — Spark
    * drives one partition iterator from one task thread, so sessions may
    * hold mutable native state (digest instances, scratch buffers,
    * decoder handles) without synchronization. */
  trait Session {
    /** Container-level metadata (media type, dimensions, frame count). */
    def metadata(in: MultimodalOps.MediaIn): MultimodalOps.MediaMeta

    /** Decode the clamped byte range `[start, start+len)` of a payload:
      * the decoded bytes plus a hex content digest (provenance a
      * downstream trainer can verify). */
    def slice(payload: Array[Byte], start: Int, len: Int): (Array[Byte], String)

    /** Scalar feature of a decoded slice — the stand-in for whatever a
      * real DSP/vision codec emits per analysis frame (spectral energy,
      * luma mean, …). Must be exact/deterministic for the oracle gate. */
    def feature(bytes: Array[Byte]): Long

    /** Length in bytes of the DECODED stream for a payload — the space
      * `slice` offsets address. Analysis geometry (window spans, frame
      * counts) must derive from THIS, not the container byte length: a
      * WAV's 44-byte header would otherwise push the last windows past
      * the plane (silent zero tails), and the same PCM in a different
      * container (AU/AIFF headers differ) would get different window
      * positions — breaking container-invariant fingerprints. Identity
      * for raw byte streams. */
    def planeLength(payload: Array[Byte]): Int = payload.length

    /** Smallest addressable unit of the decoded stream, in bytes —
      * analysis windows must start and end on multiples of this or the
      * feature parses garbage (a 16-bit PCM window sliced at an odd
      * offset reads byte pairs straddling two samples; gain covariance
      * and every spectral property die). 1 for byte streams (Stub,
      * images-as-bytes), 2 for 16-bit mono PCM (WavCodec). */
    def frameBytes: Int = 1

    /** Nearest-neighbor resample to a dstW × dstH thumbnail, returned as
      * row-major pixel intensities in [0, 255]. The stub interprets the
      * payload as a srcW-wide row-major byte image (ragged last row, out
      * of range → 0); a real codec decodes the payload and ignores srcW,
      * sampling its true pixel grid (intensity = exact integer luma).
      * Must be exact/deterministic for the oracle gate. */
    def resize(payload: Array[Byte], srcW: Int, dstW: Int, dstH: Int): Array[Int]
  }

  /** Default deterministic stub (see class doc). */
  object Stub extends MediaCodec {
    def open(): Session = new Session {
      // the one-per-partition "codec handle": a reusable digest instance
      private val md = java.security.MessageDigest.getInstance("MD5")

      def metadata(in: MultimodalOps.MediaIn): MultimodalOps.MediaMeta = {
        val len = in.payload.length.toLong
        MultimodalOps.MediaMeta(
          doc_id = in.doc_id,
          media_type =
            if (len % 3 == 0) "image" else if (len % 3 == 1) "audio" else "video",
          width = (len * 31 + 7) % 640 + 1,
          height = (len * 17 + 3) % 480 + 1,
          n_frames = len % 30 + 1,
          size_bytes = len)
      }

      def slice(payload: Array[Byte], start: Int, len: Int): (Array[Byte], String) = {
        val bytes = java.util.Arrays.copyOfRange(
          payload, start, math.min(start + len, payload.length))
        md.reset()
        (bytes, md.digest(bytes).map("%02x".format(_)).mkString)
      }

      def feature(bytes: Array[Byte]): Long = {
        var e = 0L
        var i = 0
        while (i < bytes.length) { e += (bytes(i) & 0xff); i += 1 }
        e
      }

      def resize(payload: Array[Byte], srcW: Int, dstW: Int, dstH: Int): Array[Int] = {
        val len = payload.length
        val srcH = (len + srcW - 1) / srcW
        val out = new Array[Int](dstW * dstH)
        var y = 0
        while (y < dstH) {
          val sy = y * srcH / dstH
          var x = 0
          while (x < dstW) {
            val sx = x * srcW / dstW
            val idx = sy * srcW + sx
            out(y * dstW + x) = if (idx < len) payload(idx) & 0xff else 0
            x += 1
          }
          y += 1
        }
        out
      }
    }
  }
}
