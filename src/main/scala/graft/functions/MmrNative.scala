package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection kernel (Carbonell & Goldstein,
  * "The Use of MMR, Diversity-Based Reranking for Reordering Documents
  * and Producing Summaries", SIGIR 1998 — public literature): greedily
  * pick k candidates maximizing `λ·rel − (1−λ)·max_{s∈selected}
  * cos(cand, s)` — relevance traded against redundancy with what is
  * already picked.
  *
  * The greedy loop is inherently sequential PER QUERY (selection s+1
  * depends on selection s), so it runs as a per-row native kernel over
  * the query's ALREADY-BOUNDED candidate list (a top-k run, ≤ tens of
  * rows) — O(k·n·d) per query row, embarrassingly parallel ACROSS
  * queries, never a driver loop ([[VectorNative]]'s discipline).
  *
  * Numeric contract: vectors arrive L2-normalized (similarity = bare
  * ordered-fold dot); the first pick's redundancy term is exactly 0.0,
  * and λ multiplies BEFORE the subtraction — at λ = 1 the score is
  * `1.0·rel − 0.0·sim = rel` bit for bit, which makes λ=1 a true
  * identity point (the q159-style oracle anchor). Ties select the
  * EARLIEST candidate position (strict > comparison), so feeding
  * candidates in rank order makes ties resolve to the better original
  * rank, deterministically. */
object MmrNative {

  /** `rels`: array<double> (higher = more relevant); `vecs`:
    * array<array<double>> of L2-normalized candidate vectors, parallel
    * to `rels`. Returns the 0-based POSITIONS of the min(k, n)
    * selections in pick order. */
  def mmrSelect(rels: Column, vecs: Column, lambda: Double, k: Int): Column =
    ColumnBridge.column(MmrSelect(
      ColumnBridge.expr(rels.cast(ArrayType(DoubleType))),
      ColumnBridge.expr(vecs.cast(ArrayType(ArrayType(DoubleType)))),
      lambda, k))

  def evalMmrSelect(rels: ArrayData, vecs: ArrayData, lambda: Double,
                    k: Int): GenericArrayData = {
    val n = rels.numElements()
    if (vecs.numElements() != n) throw new IllegalArgumentException(
      s"mmr_select: ${vecs.numElements()} vectors for $n relevances")
    val rl = new Array[Double](n)
    val vs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      if (rels.isNullAt(i) || vecs.isNullAt(i))
        throw new IllegalArgumentException(
          s"mmr_select: null candidate at position $i")
      rl(i) = rels.getDouble(i)
      vs(i) = vecs.getArray(i).toDoubleArray()
      if (vs(i).length != vs(0).length)
        throw new IllegalArgumentException(
          s"mmr_select: vector dimension mismatch at position $i " +
            s"(${vs(i).length} vs ${vs(0).length})")
      i += 1
    }
    val out = new Array[Int](math.min(k, n))
    val used = new Array[Boolean](n)
    // max similarity to the selected set so far; meaningless until the
    // first pick (the s==0 branch never reads it)
    val maxSim = new Array[Double](n)
    var s = 0
    while (s < out.length) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!used(i)) {
          val penalty = if (s == 0) 0.0 else maxSim(i)
          val score = lambda * rl(i) - (1.0 - lambda) * penalty
          if (best < 0 || score > bestScore) { best = i; bestScore = score }
        }
        i += 1
      }
      used(best) = true
      out(s) = best
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val w = vs(best); val v = vs(j)
          var d = 0.0
          var x = 0
          while (x < v.length) { d += w(x) * v(x); x += 1 }
          if (s == 0 || d > maxSim(j)) maxSim(j) = d
        }
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

case class MmrSelect(left: Expression, right: Expression, lambda: Double,
                     k: Int) extends BinaryExpression {
  require(k > 0, s"mmr_select: k must be positive: $k")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"mmr_select: lambda must be in [0, 1]: $lambda")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(r: Any, v: Any): Any =
    MmrNative.evalMmrSelect(r.asInstanceOf[ArrayData],
      v.asInstanceOf[ArrayData], lambda, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, v) =>
      s"graft.functions.MmrNative.evalMmrSelect($r, $v, $lambda, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "mmr_select"
}
