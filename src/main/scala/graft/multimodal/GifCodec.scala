package graft.multimodal

/** REAL GIF pixel codec — [[PngCodec]]'s palette sibling, closing the
  * largest remaining visible-stub decline in the image family
  * (round-10 verdict #4). GIF's mandatory path is self-contained: a
  * fixed header walk plus LZW, which is ~100 lines of bit twiddling and
  * needs no library. Same zero-new-deps discipline as the rest of
  * `multimodal`.
  *
  * Envelope, stated honestly: single-frame decode (the FIRST image
  * descriptor of an animated file — features describe the poster
  * frame), interlaced or not (GIF interlacing is a fixed 4-pass row
  * permutation, undone after LZW), global or local color table, any
  * LZW minimum code size the spec allows (2..8), full 12-bit
  * dictionary growth with clear-code resets. Files with no color table
  * and malformed LZW streams return None — the caller falls back to
  * its clearly-marked stub, exactly like [[PngCodec]] declining JPEG.
  *
  * Decoded output is palette-expanded RGB (channels = 3, row-major
  * y→x→channel, 0..255) so downstream features treat GIF and truecolor
  * PNG identically.
  *
  * The encoder exists for fixtures and oracles (the q50 pattern): a
  * REAL LZW compressor (hash-dict, deferred code-width growth, 4096
  * reset) — not the literals-only "uncompressed GIF" trick — so
  * decoding our own fixtures exercises the dictionary-growth and
  * copy-extension paths a literal stream never would.
  *
  * Scale shape: both directions are per-row kernels inside narrow
  * mapPartitions batches ([[Multimodal.imageFeatures]]); payload bytes
  * never shuffle. */
object GifCodec {

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  // ---- decode ----

  /** Decode a GIF this codec covers: Some((w, h, 3, rgbSamples)) or
    * None (caller stubs, never guesses — corrupt bytes must not fail
    * the batch). */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = u16le(bytes, 6); val sh = u16le(bytes, 8)
    val packed = bytes(10) & 0xff
    var p = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07)
      if (p + 3 * n > bytes.length) return None
      gct = readPalette(bytes, p, n)
      p += 3 * n
    }
    // walk blocks to the first image descriptor, skipping extensions
    while (p < bytes.length) {
      (bytes(p) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while (p < bytes.length && (bytes(p) & 0xff) != 0)
            p += 1 + (bytes(p) & 0xff)
          if (p >= bytes.length) return None
          p += 1 // block terminator
        case 0x2c => // image descriptor
          if (p + 10 > bytes.length) return None
          val iw = u16le(bytes, p + 5); val ih = u16le(bytes, p + 7)
          val ipacked = bytes(p + 9) & 0xff
          val interlaced = (ipacked & 0x40) != 0
          if (iw < 1 || ih < 1 || iw > (1 << 14) || ih > (1 << 14)) return None
          // a frame smaller than the screen is fine (we decode the frame);
          // one LARGER than the declared screen is malformed
          if (sw > 0 && sh > 0 && (iw > sw || ih > sh)) return None
          p += 10
          var pal = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 0x07)
            if (p + 3 * n > bytes.length) return None
            pal = readPalette(bytes, p, n)
            p += 3 * n
          }
          if (pal == null) return None // no color table anywhere: decline
          if (p >= bytes.length) return None
          val minCode = bytes(p) & 0xff
          if (minCode < 2 || minCode > 8) return None
          p += 1
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream(bytes.length - p)
          while (p < bytes.length && (bytes(p) & 0xff) != 0) {
            val n = bytes(p) & 0xff
            if (p + 1 + n > bytes.length) return None
            data.write(bytes, p + 1, n)
            p += 1 + n
          }
          val raw = lzwDecode(data.toByteArray, minCode, iw * ih)
          if (raw == null) return None
          // interlaced: rows arrive in 4-pass order (0,8.. / 4,12.. /
          // 2,6.. / 1,3..); permute back to top-to-bottom
          val idx = if (!interlaced) raw else {
            val ordered = new Array[Int](raw.length)
            var sr = 0
            interlaceRows(ih).foreach { y =>
              System.arraycopy(raw, sr * iw, ordered, y * iw, iw)
              sr += 1
            }
            ordered
          }
          val out = new Array[Int](iw * ih * 3)
          var i = 0
          while (i < iw * ih) {
            val c = idx(i)
            if (c >= pal.length) return None // index past the palette
            val rgb = pal(c)
            out(3 * i) = (rgb >> 16) & 0xff
            out(3 * i + 1) = (rgb >> 8) & 0xff
            out(3 * i + 2) = rgb & 0xff
            i += 1
          }
          return Some((iw, ih, 3, out))
        case 0x3b => return None // trailer before any image
        case _ => return None    // unknown block: hostile or corrupt
      }
    }
    None
  }

  /** The stream order of rows for a GIF's fixed 4-pass interlace. */
  private def interlaceRows(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  private def readPalette(b: Array[Byte], at: Int, n: Int): Array[Int] =
    Array.tabulate(n) { j =>
      ((b(at + 3 * j) & 0xff) << 16) | ((b(at + 3 * j + 1) & 0xff) << 8) |
        (b(at + 3 * j + 2) & 0xff)
    }

  /** GIF-variant LZW over a concatenated sub-block stream, LSB-first bit
    * packing, 12-bit max codes, clear/end handling; returns exactly
    * `nPixels` palette indices or null on any malformation. Dictionary
    * as prefix links (prefix, suffix) — O(1) per entry, output via an
    * explicit stack, no per-entry byte-array allocation. */
  private def lzwDecode(d: Array[Byte], minCode: Int, nPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = end + 1
    var codeLen = minCode + 1
    val out = new Array[Int](nPixels)
    var written = 0
    var prev = -1
    var acc = 0L; var accBits = 0; var bp = 0
    while (true) {
      while (accBits < codeLen) {
        if (bp >= d.length) return null // ran dry before end code
        acc |= (d(bp) & 0xffL) << accBits
        accBits += 8; bp += 1
      }
      val code = (acc & ((1L << codeLen) - 1)).toInt
      acc >>>= codeLen; accBits -= codeLen
      if (code == clear) {
        next = end + 1; codeLen = minCode + 1; prev = -1
      } else if (code == end) {
        return if (written == nPixels) out else null
      } else {
        if (prev == -1) {
          if (code >= clear) return null // first code must be a literal
          if (written >= nPixels) return null
          out(written) = code; written += 1
          prev = code
        } else {
          if (code > next || (code == next && next >= 4096)) return null
          // resolve the sequence for `code` (KwKwK case uses prev + its
          // first byte) onto the stack, then emit in order
          var sp = 0
          var c = if (code == next) prev else code
          if (code == next) {
            // placeholder for the repeated first byte, filled below
            sp = 1
          }
          while (c >= clear + 2) { // walk prefix links down to a literal
            stack(sp) = suffix(c); sp += 1; c = prefix(c)
          }
          if (c >= clear) return null
          stack(sp) = c.toByte; sp += 1
          if (code == next) stack(0) = c.toByte // KwKwK: first byte of prev
          if (written + sp > nPixels) return null
          var j = sp - 1
          while (j >= 0) { out(written) = stack(j) & 0xff; written += 1; j -= 1 }
          if (next < 4096) {
            // new entry = prev's sequence + FIRST byte of this output
            prefix(next) = prev
            suffix(next) = out(written - sp).toByte
            next += 1
            if (next == (1 << codeLen) && codeLen < 12) codeLen += 1
          }
          prev = code
        }
        if (written == nPixels) {
          // spec requires the end code; tolerate it arriving next
          return out
        }
      }
    }
    null // unreachable
  }

  // ---- fixture/oracle encoder ----

  /** Encode palette indices as a real GIF89a with a REAL LZW compressor.
    * `palette` is packed 0xRRGGBB (1..256 entries, padded internally to
    * the next power of two as the spec requires); `indices` row-major.
    * `interlaced = true` writes rows in the 4-pass interlace order with
    * the flag set, so fixtures exercise the decoder's permutation. */
  def encode(w: Int, h: Int, palette: Array[Int], indices: Array[Int],
             interlaced: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && indices.length == w * h,
      s"bad dims: $w x $h vs ${indices.length}")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size: ${palette.length}")
    require(indices.forall(i => i >= 0 && i < palette.length),
      "index past the palette")
    // palette size must be a power of two >= 4 (minCode >= 2)
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    bits = math.max(bits, 2)
    val padded = palette.padTo(1 << bits, 0)
    val minCode = bits
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | ((bits - 1) & 0x07)) // GCT present, size 2^bits
    out.write(0); out.write(0)            // bg index, aspect
    padded.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
    }
    out.write(0x2c) // image descriptor at (0,0), no LCT
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlaced) 0x40 else 0)
    out.write(minCode)
    val stream =
      if (!interlaced) indices
      else {
        val s = new Array[Int](indices.length)
        var sr = 0
        interlaceRows(h).foreach { y =>
          System.arraycopy(indices, y * w, s, sr * w, w)
          sr += 1
        }
        s
      }
    val lzw = lzwEncode(stream, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 16)
    var acc = 0L; var accBits = 0
    var codeLen = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeLen
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8
      }
    }
    // (prefixCode << 8 | byte) -> code; rebuilt on reset
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = end + 1
    emit(clear)
    var prefixCode = indices(0)
    var i = 1
    while (i < indices.length) {
      val c = indices(i)
      val key = Integer.valueOf((prefixCode << 8) | c)
      val hit = dict.get(key)
      if (hit != null) prefixCode = hit.intValue()
      else {
        emit(prefixCode)
        dict.put(key, Integer.valueOf(next))
        next += 1
        // widen AFTER the decoder's mirror entry no longer fits: the
        // decoder lags one entry, hence the +1 convention
        if (next == (1 << codeLen) + 1 && codeLen < 12) codeLen += 1
        if (next > 4095) { // dictionary full: reset both sides
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = end + 1
          codeLen = minCode + 1
        }
        prefixCode = c
      }
      i += 1
    }
    emit(prefixCode)
    emit(end)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}
