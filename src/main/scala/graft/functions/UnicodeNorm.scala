package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — Spark has
  * no builtin for it, and text corpora mix composed and decomposed forms
  * (e.g. `é` as U+00E9 vs `e` + U+0301) that must fingerprint identically
  * before any dedup pass.
  *
  * The kernel fast-paths the overwhelmingly common case — all-ASCII input,
  * NFC by definition — on the raw UTF-8 bytes with ZERO allocation (no
  * String round trip at all); non-ASCII strings that are already composed
  * pay one `toString` for the `Normalizer.isNormalized` scan, and only
  * strings that actually need composing pay the normalize. */
object UnicodeNorm {

  def evalNfc(s: UTF8String): UTF8String = {
    // ASCII bytes are 0x00-0x7F (sign bit clear); any UTF-8 continuation
    // or lead byte has it set — one branch per byte, no allocation
    var i = 0
    val n = s.numBytes
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expr(text)))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.evalNfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.UnicodeNorm.evalNfc($v)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
