package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL image-container metadata from a binary payload column, as one
  * codegen'd scalar pass: `image_meta(content)` parses the PNG / JPEG /
  * GIF / BMP header bytes directly (no codec library — same no-new-deps
  * discipline as the spreadsheet readers in [[graft.sources.XlsIngest]])
  * and yields `struct(format, width, height, bit_depth, channels)`, or
  * NULL when the payload is not a recognized image (truncated headers
  * included — a corrupt-payload row must not fail the scan).
  *
  * This replaces the metadata half of the multimodal stub: dimensions /
  * depth / channels come from the actual container now; only PIXEL
  * decode (inflate/DCT) remains stubbed ([[graft.multimodal.Multimodal.StubCodec]]).
  *
  * Scale shape: a narrow whole-stage-codegen expression over the scan —
  * payload bytes never shuffle, the parse touches only the first few
  * hundred bytes of each payload (JPEG walks marker segments but stops
  * at the first SOF), and downstream joins/aggs carry the ~20-byte
  * struct, not the payload.
  *
  * Formats (spec fields read, nothing else trusted):
  *  - PNG (ISO 15948): 8-byte signature, IHDR width/height (u32 BE),
  *    bit depth, color type → channels {0:gray=1, 2:rgb=3, 3:palette=1,
  *    4:gray+alpha=2, 6:rgba=4}.
  *  - JPEG (ITU T.81): marker walk from SOI to the first SOF0-SOF15
  *    (excluding DHT/JPG/DAC), reading precision/height/width/nComp;
  *    stops at SOS/EOI (dims always precede scan data).
  *  - GIF (87a/89a): logical-screen width/height (u16 LE), color
  *    resolution bits → bit depth, 3 channels.
  *  - BMP (BITMAPINFOHEADER+): width/height (i32 LE, |height| — negative
  *    means top-down), bpp → channels = max(1, bpp/8).
  */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageMetaExpr.schema
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"image_meta expects BINARY, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    ImageMetaExpr.parseHeader(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageMetaExpr.parseHeader($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): ImageMetaExpr = copy(c)
  override def prettyName: String = "image_meta"
}

object ImageMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  def imageMeta(c: Column): Column =
    ColumnBridge.column(ImageMetaExpr(ColumnBridge.expr(c)))

  private def row(fmt: String, w: Int, h: Int, depth: Int, ch: Int): InternalRow = {
    if (w <= 0 || h <= 0 || depth <= 0 || ch <= 0) return null
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h, depth, ch))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Kernel deliberately NOT named `eval` (see [[SimHash48.sig48]]'s
    * static-forwarder note). Null on anything unrecognized/truncated. */
  def parseHeader(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 2) return null
    if (b.length >= 26 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a) {
      // first chunk must be IHDR (spec); its 13 bytes end at offset 28
      if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return null
      val w = i32be(b, 16)
      val h = i32be(b, 20)
      val depth = u8(b, 24)
      val ch = u8(b, 25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return null
      }
      return row("png", w, h, depth, ch) // i32be < 0 => out-of-spec u32, rejected by row()
    }
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) { // SOI
      var i = 2
      while (i + 1 < b.length) {
        if (u8(b, i) != 0xff) return null // desynced: not a marker
        var m = u8(b, i + 1)
        while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
        if (m == 0xd9 || m == 0xda) return null // EOI/SOS before any SOF
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
        else {
          if (i + 3 >= b.length) return null
          val len = u16be(b, i + 2)
          if (len < 2) return null
          val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            if (i + 9 >= b.length) return null
            val depth = u8(b, i + 4)
            val h = u16be(b, i + 5)
            val w = u16be(b, i + 7)
            val ch = u8(b, i + 9)
            return row("jpeg", w, h, depth, ch)
          }
          i += 2 + len
        }
      }
      return null
    }
    if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = u16le(b, 6)
      val h = u16le(b, 8)
      val depth = ((u8(b, 10) >> 4) & 7) + 1 // color resolution bits
      return row("gif", w, h, depth, 3)
    }
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
      val dibSize = i32le(b, 14)
      if (dibSize < 40) return null // core/OS2 headers not supported
      val w = i32le(b, 18)
      val h = math.abs(i32le(b, 22)) // negative = top-down row order
      val bpp = u16le(b, 28)
      return row("bmp", w, h, bpp, math.max(1, bpp / 8))
    }
    null
  }
}
