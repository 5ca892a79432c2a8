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
  * The kernel fast-paths already-normalized strings (the overwhelmingly
  * common case — all of ASCII) through `Normalizer.isNormalized`, which
  * scans without allocating; only strings that actually need composing pay
  * for the String round trip. */
object UnicodeNorm {

  def evalNfc(s: UTF8String): UTF8String = {
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
