package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt → rule-table parser as ONE codegen'd scalar:
  * `robots_rules(body)` walks a fetched robots.txt body and yields the
  * `array<struct<prefix, allow>>` that applies to a given crawler
  * product token — the missing front half of
  * [[graft.operators.CrawlPolicy.applyPolicy]], which until now took a
  * pre-extracted rules table on faith. One explode turns the array
  * into applyPolicy's (host, prefix, allow) shape, so the whole
  * fetch-policy path is: crawl stores (host, robots_body) → parse →
  * explode → broadcast policy join. Bodies never shuffle; the parse is
  * a narrow per-row pass (robots.txt is KB-sized by convention).
  *
  * Semantics implemented (RFC 9309 + the Google de-facto standard,
  * subset stated honestly):
  *  - lines split on `\r?\n`; `#` comments stripped; blank and
  *    malformed (no `:`) lines ignored — they do NOT close a group;
  *  - directives are case-insensitive, values trimmed;
  *  - consecutive `User-agent:` lines accumulate ONE group's agent
  *    set; any rule or other directive (crawl-delay, sitemap, …)
  *    closes the accumulation, so a later `User-agent:` starts a new
  *    group;
  *  - group selection per RFC 9309 §2.2.1: groups whose agent token
  *    EXACTLY equals the crawler's product token (case-insensitive)
  *    win; only if NO such group exists anywhere do the `*` groups
  *    apply — and if a matching group exists but carries no rules,
  *    everything is allowed (no silent fallback to `*`);
  *  - `Allow:`/`Disallow:` with an EMPTY value emit no rule (the
  *    standard "allow everything" idiom);
  *  - rule values pass through VERBATIM — `*`/`$` pattern matching,
  *    longest-match, and allow-beats-disallow all live in
  *    [[graft.operators.CrawlPolicy]], one semantics for hand-authored
  *    and parsed rules alike;
  *  - other directives are ignored (crawl-delay/sitemap are not path
  *    rules); nothing throws on hostile bodies (the crawl contract).
  */
case class RobotsTxtExpr(child: Expression, agent: String)
  extends UnaryExpression {
  require(agent.trim.nonEmpty, "robots_rules: empty agent token")

  override def dataType: DataType = RobotsTxtExpr.schema
  override def checkInputDataTypes() =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"robots_rules expects STRING, got ${child.dataType.sql}")

  private val agentLower = agent.trim.toLowerCase(java.util.Locale.ROOT)

  override def nullSafeEval(v: Any): Any =
    RobotsTxtExpr.parse(v.asInstanceOf[UTF8String], agentLower)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("robotsAgent", agentLower,
      "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RobotsTxtExpr.parse($c, $agentRef)")
  }

  override protected def withNewChildInternal(c: Expression): RobotsTxtExpr =
    copy(child = c)
  override def prettyName: String = "robots_rules"
}

object RobotsTxtExpr {
  val schema: ArrayType = ArrayType(StructType(Seq(
    StructField("prefix", StringType, nullable = false),
    StructField("allow", BooleanType, nullable = false))), containsNull = false)

  def parse(body: UTF8String, agent: String): GenericArrayData = {
    val lines = body.toString.split("\r?\n", -1)
    val star = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    val exact = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    var curStar = false
    var curExact = false
    var accumulating = false
    var sawExactGroup = false
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon >= 0) {
          val dir = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          dir match {
            case "user-agent" =>
              if (!accumulating) { curStar = false; curExact = false }
              accumulating = true
              val tok = value.toLowerCase(java.util.Locale.ROOT)
              if (tok == "*") curStar = true
              if (tok == agent) { curExact = true; sawExactGroup = true }
            case "allow" | "disallow" =>
              accumulating = false
              if (value.nonEmpty) {
                val rule = (value, dir == "allow")
                if (curExact) exact += rule
                else if (curStar) star += rule
              }
            case _ => accumulating = false // crawl-delay, sitemap, ...
          }
        }
      }
      i += 1
    }
    val chosen = if (sawExactGroup) exact else star
    new GenericArrayData(chosen.map { case (p, a) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(p), a))
    }.toArray[Any])
  }

  def robotsRules(body: Column, agent: String = "*"): Column =
    ColumnBridge.column(RobotsTxtExpr(ColumnBridge.expr(body), agent))
}
