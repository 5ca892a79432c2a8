package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio-container metadata from a binary payload column — the
  * audio sibling of [[ImageMetaExpr]], same no-new-deps discipline:
  * `audio_meta(content)` parses WAV / AIFF / FLAC header bytes directly
  * and yields `struct(format, channels, sample_rate, bits_per_sample,
  * n_frames)`, or NULL when the payload is not recognized (truncated or
  * corrupt rows must not fail the scan). Duration is downstream
  * arithmetic: `n_frames / sample_rate` seconds.
  *
  * Scale shape: narrow whole-stage-codegen scalar over the scan; the
  * parse touches only the leading chunk headers (WAV/AIFF chunk walks
  * stop at fmt+data / COMM), and downstream operators carry the ~30-byte
  * struct while the payload bytes never shuffle.
  *
  * Formats (spec fields read, nothing else trusted):
  *  - WAV (RIFF): chunk walk over even-padded chunks; `fmt ` gives
  *    channels/rate/bits/block-align (u16/u32 LE), `data` size /
  *    block-align gives frames.
  *  - AIFF (EA IFF 85): `COMM` gives channels (u16 BE), frames (u32 BE),
  *    bits (u16 BE), and the sample rate as an 80-bit IEEE 754 extended
  *    float (15-bit exponent, explicit-1 64-bit mantissa) — decoded
  *    exactly for the integral rates audio uses.
  *  - FLAC: mandatory first STREAMINFO block; one 64-bit read unpacks
  *    rate (20 bits), channels-1 (3), bits-1 (5), total samples (36).
  */
case class AudioMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioMetaExpr.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects BINARY, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    AudioMetaExpr.parseHeader(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioMetaExpr.parseHeader($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): AudioMetaExpr = copy(c)
  override def prettyName: String = "audio_meta"
}

object AudioMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  def audioMeta(c: Column): Column =
    ColumnBridge.column(AudioMetaExpr(ColumnBridge.expr(c)))

  private def row(fmt: String, ch: Int, rate: Int, bits: Int,
                  frames: Long): InternalRow = {
    if (ch <= 0 || rate <= 0 || bits <= 0 || frames < 0) return null
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), ch, rate, bits, frames))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def i32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u32le(b: Array[Byte], i: Int): Long = i32le(b, i) & 0xffffffffL
  private def u32be(b: Array[Byte], i: Int): Long = i32be(b, i) & 0xffffffffL

  private def tag(b: Array[Byte], i: Int, s: String): Boolean = {
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  /** 80-bit IEEE 754 extended float at offset i → nearest long, or -1 if
    * not an exact non-negative integer in long range (audio rates are).
    * Shared with [[graft.multimodal.PcmCodec]]'s AIFF sample decode. */
  private[graft] def ext80(b: Array[Byte], i: Int): Long = {
    val se = u16be(b, i)
    if ((se & 0x8000) != 0) return -1L // negative rate: out of spec
    val exp = se & 0x7fff
    if (exp == 0) return 0L
    val mantHi = u32be(b, i + 2)
    val mantLo = u32be(b, i + 6)
    val mant = (mantHi << 32) | mantLo // explicit leading 1 included
    val shift = exp - 16383 - 63 // mantissa is a 64-bit fixed-point 1.63
    if (shift > 0) return -1L // >= 2^64: not a plausible rate
    if (shift < -63) return 0L
    val truncated = mant >>> -shift
    if ((truncated << -shift) != mant) return -1L // fractional rate
    truncated
  }

  /** Kernel deliberately NOT named `eval` (static-forwarder clash — see
    * [[SimHash48]]). Null on anything unrecognized or truncated. */
  def parseHeader(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var i = 12
      var ch = 0; var rate = 0; var bits = 0; var blockAlign = 0
      var dataSize = -1L; var haveFmt = false
      while (i + 8 <= b.length && (!haveFmt || dataSize < 0)) {
        val size = u32le(b, i + 4)
        if (tag(b, i, "fmt ")) {
          if (size < 16 || i + 8 + 16 > b.length) return null
          ch = u16le(b, i + 10)
          rate = i32le(b, i + 12) // rates fit a signed int
          blockAlign = u16le(b, i + 20)
          bits = u16le(b, i + 22)
          haveFmt = true
        } else if (tag(b, i, "data")) {
          dataSize = size // size may exceed remaining bytes (header-only
          // fixture / streamed payload): frames come from the declared size
        }
        // DELIBERATE 2 GiB parse cap (not a spec bound: RIFF sizes are
        // u32 and data chunks between 2 GiB and 4 GiB are legal WAV) —
        // a size past Int.MaxValue has a negative toInt, the step
        // 8+size.toInt+pad could be <= 0 (size 0xFFFFFFF8 makes it
        // exactly 0) and the walk would never advance. Such files parse
        // as null metadata by policy.
        if (size > Int.MaxValue) return null
        i += 8 + size.toInt + (size.toInt & 1) // chunks are even-padded
        if (i < 0) return null // overflow on a hostile size
      }
      if (!haveFmt || dataSize < 0 || blockAlign <= 0) return null
      return row("wav", ch, rate, bits, dataSize / blockAlign)
    }
    if (tag(b, 0, "FORM") && tag(b, 8, "AIFF")) {
      var i = 12
      while (i + 8 <= b.length) {
        val size = u32be(b, i + 4)
        if (tag(b, i, "COMM")) {
          if (size < 18 || i + 8 + 18 > b.length) return null
          val ch = u16be(b, i + 8)
          val frames = u32be(b, i + 10)
          val bits = u16be(b, i + 14)
          val rate = ext80(b, i + 16)
          if (rate <= 0L || rate > Int.MaxValue) return null
          return row("aiff", ch, rate.toInt, bits, frames)
        }
        // same hostile-size guard as the WAV walk: negative toInt would
        // zero the step and hang the scan task
        if (size > Int.MaxValue) return null
        i += 8 + size.toInt + (size.toInt & 1)
        if (i < 0) return null
      }
      return null
    }
    if (b.length >= 26 && tag(b, 0, "fLaC")) {
      if ((u8(b, 4) & 0x7f) != 0) return null // first block must be STREAMINFO
      val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
      if (len < 34) return null
      // STREAMINFO: 2+2 blocksize, 3+3 framesize, then the packed 8 bytes
      val i = 8 + 10
      if (i + 8 > b.length) return null
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | u8(b, i + k); k += 1 }
      val rate = (v >>> 44).toInt // 20 bits
      val ch = ((v >>> 41) & 0x7).toInt + 1
      val bits = ((v >>> 36) & 0x1f).toInt + 1
      val frames = v & ((1L << 36) - 1)
      return row("flac", ch, rate, bits, frames)
    }
    null
  }
}
