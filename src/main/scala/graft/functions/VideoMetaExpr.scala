package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL video-container metadata from a binary payload column — the
  * video sibling of [[ImageMetaExpr]]/[[AudioMetaExpr]], completing the
  * multimodal metadata family with the same no-new-deps discipline:
  * `video_meta(content)` parses MP4 (ISO BMFF) and AVI (RIFF) header
  * bytes directly and yields `struct(format, width, height,
  * duration_ms, n_tracks)`, or NULL when the payload is not recognized
  * (truncated or corrupt rows must not fail the scan). FRAME decode
  * stays honestly behind the stub ([[graft.multimodal.Multimodal]]
  * sampleFrames) — this expression reads only declared structure, which
  * is exactly the trust boundary a 100 TB crawl needs first: declared
  * `meta.duration_ms` can lie; these fields come from the bytes.
  *
  * Scale shape: narrow whole-stage-codegen scalar over the scan; the
  * parse walks only top-level boxes / header chunks, and downstream
  * operators carry the ~30-byte struct while payload bytes never
  * shuffle.
  *
  * Formats (spec fields read, nothing else trusted):
  *  - MP4/ISO BMFF: box walk (u32 BE size + 4CC; size 1 → u64
  *    largesize) to `moov`; `mvhd` gives timescale + duration (version
  *    0 and 1), `trak`/`tkhd` gives per-track 16.16 fixed-point
  *    width/height — the first track with nonzero dims is the video
  *    track; n_tracks counts all `trak` boxes.
  *  - AVI (RIFF): `LIST hdrl` → `avih`: µs-per-frame, total frames,
  *    stream count, width, height; duration = frames × µs/frame.
  */
case class VideoMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VideoMetaExpr.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"video_meta expects BINARY, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    VideoMetaExpr.parseHeader(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VideoMetaExpr.parseHeader($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): VideoMetaExpr = copy(c)
  override def prettyName: String = "video_meta"
}

object VideoMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  def videoMeta(c: Column): Column =
    ColumnBridge.column(VideoMetaExpr(ColumnBridge.expr(c)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)) & 0xffffffffL
  private def u32le(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  /** Kernel deliberately NOT named `eval` (static-forwarder clash — see
    * [[SimHash48]]). Null on anything unrecognized or truncated. */
  def parseHeader(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 4, "ftyp")) return parseMp4(b)
    if (tag(b, 0, "RIFF") && tag(b, 8, "AVI ")) return parseAvi(b)
    null
  }

  private def row(fmt: String, w: Int, h: Int, durMs: Long,
                  tracks: Int): InternalRow = {
    if (w < 0 || h < 0 || durMs < 0 || tracks < 0) return null
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w, h, durMs, tracks))
  }

  /** Box header at `at`: (payload offset, box end) or null. Guards the
    * same hostile-size classes as the audio walks: sizes that would
    * zero or overflow the step parse as null metadata by policy. */
  private def box(b: Array[Byte], at: Int, limit: Int): (Int, Int) = {
    if (at + 8 > limit) return null
    var size = u32be(b, at)
    var off = at + 8
    if (size == 1L) { // 64-bit largesize
      if (at + 16 > limit) return null
      size = u64be(b, at + 8)
      off = at + 16
    } else if (size == 0L) size = (limit - at).toLong // box runs to end
    if (size < (off - at).toLong || size > Int.MaxValue) return null
    val end = at + size.toInt
    if (end > limit || end <= at) return null
    (off, end)
  }

  private def parseMp4(b: Array[Byte]): InternalRow = {
    var p = 0
    while (p + 8 <= b.length) {
      val hd = box(b, p, b.length)
      if (hd == null) return null
      val (off, end) = hd
      if (tag(b, p + 4, "moov")) {
        // one pass over moov children: mvhd for the clock, trak/tkhd
        // for dims; first nonzero-dim track wins
        var timescale = 0L; var duration = -1L
        var w = 0; var h = 0; var tracks = 0
        var q = off
        while (q + 8 <= end) {
          val child = box(b, q, end)
          if (child == null) return null
          val (coff, cend) = child
          if (tag(b, q + 4, "mvhd")) {
            if (coff + 4 > cend) return null
            val ver = u8(b, coff)
            if (ver == 0) {
              if (coff + 20 > cend) return null
              timescale = u32be(b, coff + 12)
              duration = u32be(b, coff + 16)
            } else if (ver == 1) {
              if (coff + 32 > cend) return null
              timescale = u32be(b, coff + 20)
              duration = u64be(b, coff + 24)
            } else return null
          } else if (tag(b, q + 4, "trak")) {
            tracks += 1
            // find tkhd inside the trak container
            var t = coff
            while (t + 8 <= cend) {
              val tk = box(b, t, cend)
              if (tk == null) return null
              val (toff, tend) = tk
              if (tag(b, t + 4, "tkhd")) {
                val ver = u8(b, toff)
                // width/height are the LAST 8 bytes of the fullbox body:
                // v0 body = 4+80, v1 body = 4+92 (16.16 fixed point)
                val at = toff + (if (ver == 0) 76 else 88)
                if (ver > 1 || at + 8 > tend) return null
                val tw = (u32be(b, at) >> 16).toInt
                val th = (u32be(b, at + 4) >> 16).toInt
                if (w == 0 && h == 0 && (tw > 0 || th > 0)) { w = tw; h = th }
              }
              t = tend
            }
          }
          q = cend
        }
        if (timescale <= 0L || duration < 0L) return null
        return row("mp4", w, h, duration * 1000L / timescale, tracks)
      }
      p = end
    }
    null
  }

  private def parseAvi(b: Array[Byte]): InternalRow = {
    // RIFF chunk walk for LIST/hdrl, then avih inside it
    var p = 12
    while (p + 8 <= b.length) {
      val size = u32le(b, p + 4)
      if (size > Int.MaxValue) return null
      if (tag(b, p, "LIST") && tag(b, p + 8, "hdrl")) {
        val end = math.min(b.length.toLong, p + 8 + size).toInt
        var q = p + 12
        while (q + 8 <= end) {
          val csize = u32le(b, q + 4)
          if (csize > Int.MaxValue) return null
          if (tag(b, q, "avih")) {
            if (csize < 40 || q + 8 + 40 > b.length) return null
            val usPerFrame = u32le(b, q + 8)
            val totalFrames = u32le(b, q + 24)
            val streams = u32le(b, q + 32)
            val w = u32le(b, q + 40)
            val h = u32le(b, q + 44)
            if (w > Int.MaxValue || h > Int.MaxValue ||
              streams > Int.MaxValue) return null
            return row("avi", w.toInt, h.toInt,
              totalFrames * usPerFrame / 1000L, streams.toInt)
          }
          q += 8 + csize.toInt + (csize.toInt & 1)
          if (q <= 0) return null
        }
        return null
      }
      p += 8 + size.toInt + (size.toInt & 1)
      if (p <= 0) return null
    }
    null
  }
}
