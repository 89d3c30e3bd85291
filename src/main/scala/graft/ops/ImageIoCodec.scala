package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** A REAL decoder behind the [[MediaCodec]] seam, built entirely on the
  * JDK (`javax.imageio` ships with Java — no new dependencies): proof that
  * the seam's contract is implementable by a genuine codec, not just the
  * byte-slicing stub. Handles the formats the JDK readers cover (PNG, BMP,
  * GIF, JPEG where the JDK build includes it).
  *
  * Semantics against the [[MediaCodec.Session]] contract:
  *  - `metadata`: a real container parse — width/height from the decoded
  *    image, media_type = "image/<format>" from the registered reader,
  *    n_frames from the reader (animated GIFs report their frame count).
  *    Undecodable payloads → "unknown" with zero dimensions (a curation
  *    pipeline filters them; throwing would kill the task over one bad
  *    blob).
  *  - `slice(start, len)`: a byte range of the DECODED plane — the image
  *    as packed RGB rows (3 bytes/pixel, row-major), which is what a
  *    downstream vision stage consumes. Offsets address decoded bytes,
  *    exactly how the operators use them (m02's fixed-size frames become
  *    pixel-row tiles; m03's overlapping windows become scanline bands).
  *  - `feature`: integer luma sum over RGB triplets (ITU-R 601 weights in
  *    per-mille, exact integer arithmetic) — a real, deterministic "frame
  *    brightness" signal.
  *
  * Per-partition session state is where the realness shows: the expensive
  * decode runs ONCE per payload and every subsequent `slice`/`feature` on
  * the same payload reads the cached plane — the m02/m03 loop calls
  * `slice` per frame/window over one payload, and this is the difference
  * between O(frames) decodes and O(1). That cache living in the session
  * (opened once per partition, `MultimodalOps` contract) rather than in a
  * UDF closure is the whole point of the seam.
  */
object ImageIoCodec extends MediaCodec {
  def open(): MediaCodec.Session = new MediaCodec.Session {
    private val md = java.security.MessageDigest.getInstance("MD5")
    // last-payload decode cache: (payload identity, decoded RGB plane + dims)
    private var lastPayload: Array[Byte] = _
    private var lastPlane: Array[Byte] = _
    private var lastW: Int = 0
    private var lastH: Int = 0

    private def decodePlane(payload: Array[Byte]): Array[Byte] = {
      if (payload eq lastPayload) return lastPlane
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      lastW = if (img == null) 0 else img.getWidth
      lastH = if (img == null) 0 else img.getHeight
      val plane =
        if (img == null) Array.emptyByteArray
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val i = (y * w + x) * 3
              out(i) = ((rgb >> 16) & 0xff).toByte
              out(i + 1) = ((rgb >> 8) & 0xff).toByte
              out(i + 2) = (rgb & 0xff).toByte
              x += 1
            }
            y += 1
          }
          out
        }
      lastPayload = payload
      lastPlane = plane
      plane
    }

    def metadata(in: MultimodalOps.MediaIn): MultimodalOps.MediaMeta = {
      // ONE ImageInputStream, closed in finally: ImageIO's default cache
      // backs these with temp files, so an unclosed stream per payload
      // leaks file handles until GC on the hot multimodal path
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(in.payload))
      try {
        val it = ImageIO.getImageReaders(iis)
        if (!it.hasNext)
          MultimodalOps.MediaMeta(in.doc_id, "unknown", 0L, 0L, 0L,
            in.payload.length.toLong)
        else {
          val r = it.next()
          try {
            // getImageReaders does not advance the stream, so the same
            // stream feeds the chosen reader
            r.setInput(iis)
            val n = r.getNumImages(true)
            MultimodalOps.MediaMeta(
              doc_id = in.doc_id,
              media_type = s"image/${r.getFormatName.toLowerCase}",
              width = r.getWidth(0).toLong,
              height = r.getHeight(0).toLong,
              n_frames = n.toLong,
              size_bytes = in.payload.length.toLong)
          } finally r.dispose()
        }
      } finally iis.close()
    }

    def slice(payload: Array[Byte], start: Int, len: Int): (Array[Byte], String) = {
      val plane = decodePlane(payload)
      val bytes = java.util.Arrays.copyOfRange(
        plane, math.min(start, plane.length), math.min(start + len, plane.length))
      md.reset()
      (bytes, md.digest(bytes).map("%02x".format(_)).mkString)
    }

    def feature(bytes: Array[Byte]): Long = {
      // exact integer luma: (299·R + 587·G + 114·B) per pixel, summed
      var e = 0L
      var i = 0
      while (i + 2 < bytes.length) {
        e += 299L * (bytes(i) & 0xff) + 587L * (bytes(i + 1) & 0xff) +
          114L * (bytes(i + 2) & 0xff)
        i += 3
      }
      e
    }

    // REAL thumbnail: nearest-neighbor over the decoded pixel grid (srcW
    // is the stub's synthetic-stripe dial and is ignored here); intensity
    // is the exact per-pixel integer luma (ITU-R 601 per-mille weights,
    // floor division), so the output is deterministic across platforms.
    def resize(payload: Array[Byte], srcW: Int, dstW: Int, dstH: Int): Array[Int] = {
      val plane = decodePlane(payload)
      val (w, h) = (lastW, lastH)
      val out = new Array[Int](dstW * dstH)
      if (plane.isEmpty) return out
      var y = 0
      while (y < dstH) {
        val sy = y * h / dstH
        var x = 0
        while (x < dstW) {
          val sx = x * w / dstW
          val i = (sy * w + sx) * 3
          out(y * dstW + x) =
            ((299 * (plane(i) & 0xff) + 587 * (plane(i + 1) & 0xff) +
              114 * (plane(i + 2) & 0xff)) / 1000)
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
