package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a document's CODE-POINT distribution, in bits —
  * the classic gibberish/noise screen (Shannon, "A Mathematical Theory
  * of Communication", BSTJ 1948 — public literature): base64 blobs,
  * hex dumps, and key-mash score far from prose (English prose sits
  * ~4–4.5 bits; uniform base64 ~6; "aaaa…" → 0), so entropy BANDS cut
  * both the too-low (repetition) and too-high (binary-ish) tails that
  * per-token quality filters miss.
  *
  * Exact micro protocol (the q87/q162 discipline, so a SQL oracle
  * replays it): for each distinct code point with count c of n total,
  * term = round((c/n)·log2(n/c), 6) — Spark's decimal HALF_UP round of
  * the shortest-repr double — summed as exact long micros; result =
  * Σ/10⁶. Per-term rounding makes the sum ORDER-INDEPENDENT (long
  * addition commutes; one float fold would not), hence deterministic
  * across partitionings and replayable by a per-character GROUP BY.
  * Empty or whitespace-only strings are still distributions (entropy
  * of "  " is 0.0); only NULL is NULL.
  *
  * Why native: the declarative route explodes one row PER CHARACTER —
  * a corpus-bytes-sized shuffle, the opposite of the 100 TB shape.
  * This kernel is one codegen'd scan, zero shuffle, linear per row,
  * bounded scratch (counts map ≤ distinct code points in the doc). */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType ||
      child.dataType == org.apache.spark.sql.types.NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    CharEntropyExpr.entropyBits(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyExpr.entropyBits($c)")

  override protected def withNewChildInternal(c: Expression): CharEntropyExpr =
    copy(c)
  override def prettyName: String = "char_entropy"
}

object CharEntropyExpr {
  private val Log2 = math.log(2.0)

  def charEntropy(c: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expr(c)))

  /** The exact kernel: code-point counts in one pass, per-term decimal
    * HALF_UP rounding at 6 places, long-micro sum. */
  def entropyBits(text: UTF8String): Double = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a: Integer, b: Integer) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    if (n == 0L) return 0.0
    var sumMicro = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      val term = (c.toDouble / n) * (math.log(n.toDouble / c) / Log2)
      sumMicro += java.math.BigDecimal.valueOf(term)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }
    sumMicro / 1e6
  }
}
