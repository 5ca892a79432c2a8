package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a BROADCAST Bloom filter — the task-binary-safe
  * form of Spark's `BloomFilterMightContain(Literal(bytes), v)`.
  *
  * The literal form serializes the filter into the expression tree: it
  * rides through every driver-side plan transform and ships with EVERY
  * task set. Fine at the MB scale, a driver/scheduler chokepoint at the
  * 10^8–10^9-element scale a corpus-sized contamination list needs
  * (0.6–1.2 GB serialized). Here the expression holds only the broadcast
  * HANDLE (bytes ship once per executor via the broadcast machinery) and
  * resolves `bc.value` once per codegen instance, not per row.
  *
  * Accepts INT or LONG input (widened to long — the same widening
  * `DataFrameStatFunctions.bloomFilter` applies when building over an
  * integral column). Null in → null out (UnaryExpression default).
  */
case class BloomMightContainBc(bc: Broadcast[BloomFilter], child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"might_contain_bc expects INT or BIGINT, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case i: java.lang.Integer => bc.value.mightContainLong(i.longValue())
    case l: java.lang.Long => bc.value.mightContainLong(l.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bc, bcCls)
    // fetch the executor-local broadcast value ONCE per codegen instance
    // (init section), not per row
    val bloom = ctx.addMutableState(bfCls, "bloomFilter",
      v => s"$v = ($bfCls) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$bloom.mightContainLong((long) $c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainBc =
    copy(child = c)
  override def prettyName: String = "might_contain_bc"
}

object BloomMightContainBc {
  def mightContain(bc: Broadcast[BloomFilter], v: Column): Column =
    ColumnBridge.column(BloomMightContainBc(bc, ColumnBridge.expr(v)))
}
