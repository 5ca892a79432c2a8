package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.execution.SparkStrategy

/** Per-key top-k as a first-class operator:
  * `TopK.perKey(df, keys, orderBy, k)` ≡
  * `row_number().over(Window.partitionBy(keys).orderBy(orderBy)) <= k`
  * but with a fundamentally better physical shape.
  *
  * The window formulation shuffles EVERY candidate row, then fully sorts
  * each partition. This operator runs bounded per-key heaps BEFORE the
  * exchange (partial stage, shuffle volume ≤ keys×k instead of all rows)
  * and again after (final stage) — the same partial/final contract as a
  * hash aggregate, applied to top-k. For ANN search over 10^10 candidate
  * pairs, the exchange carries k rows per query instead of the corpus.
  *
  * Wiring: [[TopKPerKeyPlan]] (logical) is planned by [[TopKStrategy]]
  * (injected via [[GraftExtensions]]) into partial+final
  * [[TopKPerKeyExec]] nodes; EnsureRequirements inserts the hash exchange
  * between them from `requiredChildDistribution`.
  */
object TopK {

  /** One sort key: column name + direction. */
  final case class Sort(name: String, desc: Boolean = false)

  /** Columns are resolved against the frame here (by analyzer resolver),
    * so the logical node is born fully resolved — Spark 4 `Column`s are
    * lazy column nodes the generic analyzer won't resolve inside a
    * custom operator. */
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Sort], k: Int,
             rankName: String = "rank"): DataFrame = {
    // belt-and-suspenders: sessions built through GraftExtensions carry
    // the strategy already; a plain session (a user's, a bare test
    // fixture) would otherwise die at planning with "No plan for
    // TopKPerKeyPlan". Idempotent; synchronized because extraStrategies
    // is a bare var on shared session state — a racing check-then-append
    // from two threads can lose the strategy entirely (planning then
    // fails) or register it twice.
    val exp = df.sparkSession.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(TopKStrategy))
        exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val so = orderBy.map(s =>
      SortOrder(attr(s.name), if (s.desc) Descending else Ascending))
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(k, keys.map(attr), so, rank, analyzed))
  }
}

case class TopKPerKeyPlan(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          rankAttr: Attribute, child: LogicalPlan)
  extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKeyPlan =>
      val partialExec: SparkPlan = TopKPerKeyExec(t.k, t.keys, t.order,
        None, partial = true, planLater(t.child))
      TopKPerKeyExec(t.k, t.keys, t.order, Some(t.rankAttr), partial = false,
        partialExec) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key heaps over each partition. Partial stage emits
  * surviving rows unranked (any distribution); final stage requires
  * clustering on the keys and emits rank 1..k per key. */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          rankAttr: Option[Attribute], partial: Boolean,
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val emitRank = rankAttr.isDefined
    val rankAttrs = rankAttr.toSeq
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = GenerateOrdering.generate(sortOrder, childOutput)
      // head of each queue = WORST surviving row (reverse ordering)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reverse = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = rowOrd.compare(b, a)
      }
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // INITIAL capacity only — the queue grows to at most `limit`.
          // Seeding it with limit+1 preallocated a k-sized array per
          // (task, key) before a single row justified it (k=100M quota
          // = 800 MB of empty arrays), and overflowed to a negative
          // capacity at k = Int.MaxValue.
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16) + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val outAttrs = childOutput ++ rankAttrs
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      heaps.entrySet().iterator().asScala.flatMap { e =>
        val rows = e.getValue.toArray(new Array[InternalRow](e.getValue.size()))
        java.util.Arrays.sort(rows, rowOrd)
        if (emitRank) rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.setInt(0, i + 1)
          outProj(joined(r, rankRow))
        } else rows.iterator // partial: copied UnsafeRows pass through as-is
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
