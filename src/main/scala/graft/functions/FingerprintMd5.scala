package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document fingerprint:
  * `fingerprint_md5(text)` ≡ `md5(lower(regexp_replace(trim(text), "\s+", " ")))`
  * — trim spaces, collapse ASCII-\s runs to single spaces, lowercase, md5
  * hex — without materializing the three intermediate strings or running
  * the regex engine. The whitespace class is exactly Java regex `\s`
  * ([ \t\n\x0B\f\r]), so results match the composed form byte-for-byte
  * (spec-fuzzed), and the DuckDB oracle's regexp_replace(...,'g').
  */
case class FingerprintMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    FingerprintMd5.fp(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FingerprintMd5.fp($c)")

  override protected def withNewChildInternal(c: Expression): FingerprintMd5 = copy(c)
  override def prettyName: String = "fingerprint_md5"
}

object FingerprintMd5 {
  private val hexChars = "0123456789abcdef".toCharArray
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def fp(text: UTF8String): UTF8String = {
    // 1. trim 0x20 only (Spark trim semantics)
    val raw = text.getBytes
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw(lo) == ' ') lo += 1
    while (hi > lo && raw(hi - 1) == ' ') hi -= 1
    // 2. collapse \s+ runs to a single space
    val buf = new Array[Byte](hi - lo)
    var n = 0
    var i = lo
    while (i < hi) {
      val b = raw(i)
      if (isWs(b)) {
        buf(n) = ' '; n += 1
        while (i < hi && isWs(raw(i))) i += 1
      } else {
        buf(n) = b; n += 1; i += 1
      }
    }
    // 3. lowercase — via UTF8String so unicode case rules match Spark lower()
    val lowered = UTF8String.fromBytes(buf, 0, n).toLowerCase.getBytes
    // 4. md5 hex
    val md = tlMd.get()
    md.reset()
    val d = md.digest(lowered)
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(j * 2) = hexChars((d(j) >> 4) & 0xf)
      out(j * 2 + 1) = hexChars(d(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  def fingerprintMd5(c: Column): Column =
    ColumnBridge.column(FingerprintMd5(ColumnBridge.expr(c)))
}
