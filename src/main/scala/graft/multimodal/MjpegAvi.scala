package graft.multimodal

/** Motion-JPEG AVI frame extraction — REAL video frame decode for the
  * one video codec family this build can decode honestly: an MJPEG AVI
  * is a RIFF container whose `movi` chunks each hold a complete
  * baseline JPEG, and [[JpegCodec]] already decodes those. Everything
  * else (H.264/VP9/AV1 — real inter-frame codecs) stays honestly
  * behind the stub frame sampler.
  *
  * Envelope: RIFF/AVI, `LIST hdrl`/`avih` for the frame clock,
  * `LIST movi` with compressed-video (`..dc`) chunks; other chunk
  * types (audio `..wb`, index `idx1`) are skipped. Hostile declared
  * sizes terminate as None, same policy as [[graft.functions.VideoMetaExpr]].
  *
  * Scale shape: the walk yields (offset, length) slices over the
  * payload; per-frame JPEG decode happens downstream in the same
  * narrow batch — video bytes never shuffle. */
object MjpegAvi {

  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  /** (µs per frame, video frame payloads in stream order), or None. */
  def decode(b: Array[Byte]): Option[(Long, Seq[Array[Byte]])] = {
    if (b == null || b.length < 12) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var usPerFrame = -1L
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 12
    while (p + 8 <= b.length) {
      val size = u32le(b, p + 4)
      if (size > Int.MaxValue) return None
      val end = math.min(b.length.toLong, p + 8 + size).toInt
      if (tag(b, p, "LIST") && tag(b, p + 8, "hdrl")) {
        var q = p + 12
        while (q + 8 <= end && usPerFrame < 0) {
          val cs = u32le(b, q + 4)
          if (cs > Int.MaxValue) return None
          if (tag(b, q, "avih")) {
            if (cs < 4 || q + 12 > b.length) return None
            usPerFrame = u32le(b, q + 8)
          }
          q += 8 + cs.toInt + (cs.toInt & 1)
          if (q <= 0) return None
        }
      } else if (tag(b, p, "LIST") && tag(b, p + 8, "movi")) {
        var q = p + 12
        while (q + 8 <= end) {
          val cs = u32le(b, q + 4)
          if (cs > Int.MaxValue) return None
          // video chunks are 'NNdc' (compressed DIB); audio 'NNwb' and
          // anything else skip
          if (b(q + 2) == 'd'.toByte && b(q + 3) == 'c'.toByte) {
            if (q + 8 + cs.toInt > b.length) return None
            frames += java.util.Arrays.copyOfRange(b, q + 8, q + 8 + cs.toInt)
          }
          q += 8 + cs.toInt + (cs.toInt & 1)
          if (q <= 0) return None
        }
      }
      p += 8 + size.toInt + (size.toInt & 1)
      if (p <= 0) return None
    }
    if (usPerFrame <= 0 || frames.isEmpty) None
    else Some((usPerFrame, frames.toSeq))
  }
}
