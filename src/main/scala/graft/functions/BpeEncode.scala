package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization: apply a learned merge table to text, the encode
  * side of the loop whose count side is
  * [[graft.operators.TrainingData.bpeTopPairs]]. `bpe_encode(text,
  * merges)` whitespace-splits, then per word merges adjacent symbol
  * pairs and returns the flattened token array (word order preserved).
  *
  * Merge semantics — the contract both engines reproduce exactly:
  * merges apply in RANK ORDER, one pass each over the SYMBOL sequence,
  * merging left to right (scanning resumes after each replacement, so a
  * merged symbol never re-pairs within its pass). For a well-formed
  * table (each pair's components are single characters or products of
  * strictly earlier merges — what BPE training emits) this is the
  * standard fast path equivalent to the definitional repeat-lowest-rank
  * loop. NOTE it is NOT a single string `replace` on a delimiter-framed
  * symbol string: adjacent occurrences share a frame delimiter, so one
  * replace() scan misses every second one ('singing' → [s,ing,in,g]
  * instead of [s,ing,ing]). The SQL oracle therefore applies each
  * rank's replace() TWICE — after the first pass the missed occurrences
  * are pairwise non-adjacent, so the second pass reaches the per-rank
  * fixpoint, which matches this kernel for every rule with a != b (see
  * the oracle generator's Scaladoc for why a == b is excluded).
  *
  * Scale shape: a narrow whole-stage-codegen scalar — the merge table
  * rides along as one codegen reference object (broadcast with the
  * task binary, bounded by vocab size), tokens materialize once in the
  * scan, and downstream aggregates see counts/hashes, not text. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes() =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects STRING, got ${child.dataType.sql}")

  @transient private lazy val table: Array[Array[String]] =
    merges.map(p => Array(p._1, p._2)).toArray

  override def nullSafeEval(v: Any): Any =
    BpeEncode.encodeText(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.BpeEncode.encodeText($v, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall(p => p._1.nonEmpty && p._2.nonEmpty),
      "bpe_encode: empty merge component")
    ColumnBridge.column(BpeEncode(ColumnBridge.expr(c), merges))
  }

  /** A small well-formed English merge table for demos/tests: every
    * pair's components are single chars or earlier merge products. */
  val DemoMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "o" -> "n",
    "e" -> "r", "r" -> "e", "o" -> "r", "s" -> "t", "a" -> "r",
    "an" -> "d", "in" -> "g", "o" -> "u", "l" -> "e", "m" -> "e")

  /** Kernel deliberately NOT named `eval` (static-forwarder clash — see
    * [[SimHash48]]). Whitespace-splits, BPE-merges each word over code
    * points, flattens. Empty/blank text → empty array. */
  def encodeText(t: UTF8String, merges: Array[Array[String]]): GenericArrayData = {
    val s = t.toString
    val out = new java.util.ArrayList[AnyRef](16)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      var j = i
      while (j < n && !Character.isWhitespace(s.charAt(j))) j += 1
      if (j > i) {
        encodeWord(s.substring(i, j), merges, out)
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(w: String, merges: Array[Array[String]],
                         out: java.util.ArrayList[AnyRef]): Unit = {
    val syms = new java.util.ArrayList[String](w.length)
    var k = 0
    while (k < w.length) { // split on code points, not chars: a surrogate
      val cp = w.codePointAt(k) // pair is ONE symbol
      val len = Character.charCount(cp)
      syms.add(w.substring(k, k + len))
      k += len
    }
    var r = 0
    while (r < merges.length && syms.size > 1) {
      val a = merges(r)(0)
      val b = merges(r)(1)
      var idx = 0
      while (idx < syms.size - 1) {
        if (syms.get(idx) == a && syms.get(idx + 1) == b) {
          syms.set(idx, a + b)
          syms.remove(idx + 1)
          // scanning resumes AFTER the replacement: the merged symbol
          // never re-pairs within this pass
          idx += 1
        } else idx += 1
      }
      r += 1
    }
    var q = 0
    while (q < syms.size) {
      out.add(UTF8String.fromString(syms.get(q)))
      q += 1
    }
  }
}
