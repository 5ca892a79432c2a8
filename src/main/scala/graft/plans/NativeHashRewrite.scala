package graft.plans

import graft.functions.StableId63
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: collapse the composed built-in form of the 63-bit
  * surrogate key —
  *   cast(conv(substring(md5(k), 1, 16), 16, 10) % 2^63 as bigint)
  * (what [[graft.functions.CleanExprs.stableId]] emits) — into the native
  * [[StableId63]] expression, which digests bytes straight to a long
  * without the hex-string/decimal round-trip.
  *
  * This is the "declare with built-ins, let the optimizer pick the fast
  * implementation" contract: user code stays portable Column algebra; the
  * rule (injected via [[GraftExtensions]]) swaps in the codegen'd native
  * form. Matching is deliberately exact-shape: anything else is left
  * untouched.
  */
object NativeHashRewrite extends Rule[LogicalPlan] {

  private val mask = BigDecimal("9223372036854775808")

  private object ComposedStableId {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(
        Remainder(
          Cast(Conv(Substring(Md5(keyBin), Literal(1, IntegerType), Literal(16, IntegerType)),
            Literal(16, IntegerType), Literal(10, IntegerType), _), DecimalType(), _, _),
          Literal(m: Decimal, DecimalType()), _),
        LongType, _, _) if m.toBigDecimal == mask =>
        keyBin match {
          case Cast(key, BinaryType, _, _) if key.dataType == StringType => Some(key)
          case k if k.dataType == StringType => Some(k)
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ComposedStableId(key) => StableId63(key)
    }
}
