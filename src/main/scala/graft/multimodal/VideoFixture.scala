package graft.multimodal

/** Spec-valid video container fixtures for [[graft.functions.VideoMetaExpr]]
  * gates — the [[PcmCodec]]-encoder analog for video: minimal but
  * structurally real MP4 (ftyp + moov(mvhd + n×trak(tkhd))) and AVI
  * (RIFF(hdrl(avih))) files whose declared metadata is a pure function
  * of the constructor arguments, so a DuckDB oracle can recompute every
  * parsed field. No frame data — the parser under test reads structure
  * only, and a fixture with fabricated frames would overstate what is
  * being verified. */
object VideoFixture {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def boxOf(tag: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ tag.getBytes("US-ASCII") ++ body

  /** Minimal ISO BMFF: ftyp(isom) + moov(mvhd + tracks×trak(tkhd)).
    * The FIRST track carries (w, h); extra tracks are dimensionless
    * (sound-track shape), so n_tracks and the first-video-track rule
    * are both exercised. */
  def encodeMp4(w: Int, h: Int, timescale: Int, duration: Long,
                tracks: Int): Array[Byte] = {
    require(w >= 0 && h >= 0 && timescale > 0 && duration >= 0 && tracks >= 0)
    val ftyp = boxOf("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200L) ++ "isom".getBytes("US-ASCII"))
    val mvhd = boxOf("mvhd",
      be32(0L) ++                       // version 0, flags 0
        be32(0L) ++ be32(0L) ++         // creation, modification
        be32(timescale.toLong) ++ be32(duration) ++
        be32(0x00010000L) ++            // rate 1.0
        Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++ // volume + reserved
        new Array[Byte](8) ++           // reserved
        matrix ++
        new Array[Byte](24) ++          // pre_defined
        be32(tracks.toLong + 1))        // next_track_ID
    val traks = (0 until tracks).map { t =>
      val (tw, th) = if (t == 0) (w, h) else (0, 0)
      boxOf("trak", boxOf("tkhd",
        be32(7L) ++                     // version 0, flags: enabled|in-movie
          be32(0L) ++ be32(0L) ++       // creation, modification
          be32(t.toLong + 1) ++ be32(0L) ++ // track_ID, reserved
          be32(duration) ++
          new Array[Byte](8) ++         // reserved
          new Array[Byte](8) ++         // layer, alternate, volume, reserved
          matrix ++
          be32(tw.toLong << 16) ++ be32(th.toLong << 16))) // 16.16 fixed
    }
    val moov = boxOf("moov", mvhd ++ traks.toArray.flatten)
    ftyp ++ moov
  }

  private def matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++
      be32(0L) ++ be32(0x00010000L) ++ be32(0L) ++
      be32(0L) ++ be32(0L) ++ be32(0x40000000L)

  /** A REAL Motion-JPEG AVI: the [[encodeAvi]] header plus a
    * `LIST movi` whose `00dc` chunks each hold a complete JPEG payload
    * — the fixture [[MjpegAvi.decode]] + [[JpegCodec]] extract real
    * frames from. */
  def encodeMjpegAvi(w: Int, h: Int, usPerFrame: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && usPerFrame > 0)
    val head = encodeAvi(w, h, usPerFrame, frames.size, 1)
    val movi = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("movi".getBytes("US-ASCII"))
      frames.foreach { f =>
        out.write("00dc".getBytes("US-ASCII"))
        out.write(le32(f.length.toLong), 0, 4)
        out.write(f, 0, f.length)
        if ((f.length & 1) == 1) out.write(0) // RIFF pad
      }
      out.toByteArray
    }
    val list = "LIST".getBytes("US-ASCII") ++ le32(movi.length.toLong) ++ movi
    // splice: extend the RIFF size and append the movi list
    val total = head ++ list
    val riffSize = total.length - 8
    total(4) = (riffSize & 0xff).toByte
    total(5) = ((riffSize >> 8) & 0xff).toByte
    total(6) = ((riffSize >> 16) & 0xff).toByte
    total(7) = ((riffSize >> 24) & 0xff).toByte
    total
  }

  /** Minimal AVI: RIFF('AVI ' LIST('hdrl' avih(56))). */
  def encodeAvi(w: Int, h: Int, usPerFrame: Int, totalFrames: Int,
                streams: Int): Array[Byte] = {
    require(w >= 0 && h >= 0 && usPerFrame > 0 && totalFrames >= 0 && streams >= 0)
    val avih = "avih".getBytes("US-ASCII") ++ le32(56L) ++
      le32(usPerFrame.toLong) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(totalFrames.toLong) ++ le32(0L) ++ le32(streams.toLong) ++
      le32(0L) ++ le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16)
    val hdrl = "hdrl".getBytes("US-ASCII") ++ avih
    val list = "LIST".getBytes("US-ASCII") ++ le32(hdrl.length.toLong) ++ hdrl
    "RIFF".getBytes("US-ASCII") ++ le32(4L + list.length) ++
      "AVI ".getBytes("US-ASCII") ++ list
  }
}
