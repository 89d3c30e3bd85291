package graft.ops

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** A REAL audio decoder behind the [[MediaCodec]] seam, built entirely on
  * the JDK (`javax.sound.sampled` ships with Java — no new dependencies):
  * the audio twin of [[ImageIoCodec]], proving m02 (frame sampling) and
  * m03 (overlapping analysis windows) on genuine decoded PCM rather than
  * the byte-slicing stub. Handles the containers the JDK readers cover
  * (WAV/AU/AIFF; PCM and the JDK's built-in conversions).
  *
  * Semantics against the [[MediaCodec.Session]] contract, with the
  * image-oriented fields mapped to their audio analogues (documented here
  * because [[MultimodalOps.MediaMeta]] is one schema for all media):
  *  - `metadata`: a real container parse — media_type =
  *    "audio/<container>", `width` = sample rate (Hz), `height` = channel
  *    count, `n_frames` = sample-frame count from the header. Undecodable
  *    payloads → "unknown" with zero dimensions (curation filters them;
  *    throwing would kill the task over one bad blob — ImageIoCodec's
  *    rule).
  *  - `slice(start, len)`: a byte range of the DECODED canonical plane —
  *    the stream converted once to 16-bit signed little-endian MONO PCM
  *    at the source rate (multi-channel input downmixed by exact integer
  *    channel averaging), the canonical form a DSP stage consumes;
  *    conversion from any PCM encoding is exact integer work,
  *    deterministic across platforms. One frame = one 2-byte sample, so
  *    the `frameBytes = 2` contract holds for ANY channel count. m02's
  *    fixed-size frames become sample blocks; m03's overlapping windows
  *    become analysis frames.
  *  - `feature`: sum of |sample| over the slice's 16-bit LE samples — an
  *    exact integer "frame energy", the stand-in a real spectral feature
  *    replaces.
  *  - `resize`: a dstW×dstH waveform thumbnail: each sample maps to an
  *    intensity `(s + 32768) >> 8` ∈ [0,255] and the sample sequence is
  *    nearest-neighbor resampled as a srcW-wide row-major grid — the
  *    stub's geometry over genuinely decoded amplitudes.
  *
  * The decoded-plane cache is per-session (opened once per partition),
  * so the m02/m03 per-payload loops cost ONE decode per payload — the
  * same O(frames) → O(1) economics ImageIoCodec documents.
  */
object WavCodec extends MediaCodec {
  def open(): MediaCodec.Session = new MediaCodec.Session {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private var lastPayload: Array[Byte] = _
    private var lastPlane: Array[Byte] = _

    /** Decode once per payload: canonical 16-bit signed LE MONO PCM.
      * Multi-channel input is downmixed (average of channel samples,
      * truncating division — exact integer work, deterministic) so the
      * advertised `frameBytes = 2` holds for ANY input: before this,
      * stereo planes kept 2 bytes × channels per frame and every
      * analysis window the contract promised frame-aligned landed on
      * sample (not frame) boundaries (round-10 advice item). */
    private def decodePlane(payload: Array[Byte]): Array[Byte] = {
      if (payload eq lastPayload) return lastPlane
      val plane =
        try {
          val in = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(payload))
          try {
            val f = in.getFormat
            val ch = f.getChannels
            val canon = new AudioFormat(
              AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
              ch, 2 * ch, f.getSampleRate, /* bigEndian = */ false)
            val conv = AudioSystem.getAudioInputStream(canon, in)
            val multi = try conv.readAllBytes() finally conv.close()
            if (ch <= 1) multi
            else {
              val frames = multi.length / (2 * ch)
              val mono = new Array[Byte](2 * frames)
              var fIdx = 0
              while (fIdx < frames) {
                var acc = 0L
                var c = 0
                while (c < ch) {
                  val o = 2 * (fIdx * ch + c)
                  acc += ((multi(o) & 0xff) | (multi(o + 1) << 8)).toShort.toInt
                  c += 1
                }
                val s = (acc / ch).toInt // truncating average, exact
                mono(2 * fIdx) = (s & 0xff).toByte
                mono(2 * fIdx + 1) = ((s >> 8) & 0xff).toByte
                fIdx += 1
              }
              mono
            }
          } finally in.close()
        } catch { case _: Exception => Array.emptyByteArray }
      lastPayload = payload
      lastPlane = plane
      plane
    }

    def metadata(in: MultimodalOps.MediaIn): MultimodalOps.MediaMeta =
      try {
        val aff = AudioSystem.getAudioFileFormat(
          new ByteArrayInputStream(in.payload))
        val f = aff.getFormat
        MultimodalOps.MediaMeta(
          doc_id = in.doc_id,
          media_type = s"audio/${aff.getType.toString.toLowerCase}",
          width = f.getSampleRate.toLong,
          height = f.getChannels.toLong,
          // streamed-length containers (e.g. AU with data size 0xFFFFFFFF)
          // report AudioSystem.NOT_SPECIFIED (-1) without throwing; a
          // negative frame count must not leak into downstream aggregates
          n_frames = math.max(0L, aff.getFrameLength.toLong),
          size_bytes = in.payload.length.toLong)
      } catch {
        case _: Exception =>
          MultimodalOps.MediaMeta(in.doc_id, "unknown", 0L, 0L, 0L,
            in.payload.length.toLong)
      }

    def slice(payload: Array[Byte], start: Int, len: Int): (Array[Byte], String) = {
      val plane = decodePlane(payload)
      val bytes = java.util.Arrays.copyOfRange(
        plane, math.min(start, plane.length), math.min(start + len, plane.length))
      md.reset()
      (bytes, md.digest(bytes).map("%02x".format(_)).mkString)
    }

    override def frameBytes: Int = 2 // canonical plane is 16-bit MONO

    override def planeLength(payload: Array[Byte]): Int =
      decodePlane(payload).length

    def feature(bytes: Array[Byte]): Long = {
      // exact integer energy: sum of |16-bit LE sample| (a ragged trailing
      // byte is ignored — slices are even-length whenever callers stay on
      // sample boundaries)
      var e = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
        e += math.abs(s)
        i += 2
      }
      e
    }

    def resize(payload: Array[Byte], srcW: Int, dstW: Int, dstH: Int): Array[Int] = {
      val plane = decodePlane(payload)
      val n = plane.length / 2
      val srcH = (n + srcW - 1) / srcW
      val out = new Array[Int](dstW * dstH)
      if (n == 0) return out
      var y = 0
      while (y < dstH) {
        val sy = y * srcH / dstH
        var x = 0
        while (x < dstW) {
          val sx = x * srcW / dstW
          val idx = sy * srcW + sx
          out(y * dstW + x) =
            if (idx < n) {
              val s = ((plane(2 * idx) & 0xff) | (plane(2 * idx + 1) << 8))
                .toShort.toInt
              (s + 32768) >> 8
            } else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
