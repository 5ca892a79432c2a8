package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Per-domain scalar attributes attached to a corpus frame — the shared
  * mechanism behind every mixing/bucketing operator that carries a
  * driver-computed per-domain table (quota thresholds, sampling rates,
  * histogram cutoffs) back into the scan.
  *
  * Two value-identical plan shapes, switched on |domains|:
  *
  *  - **Literal when-chain** (≤ `chainMax` domains): each attribute is a
  *    folded `when(domain <=> lit, value)` chain — zero joins, zero
  *    exchanges, the narrow-scan plan the PlanShapeSpec gates pin. Cost
  *    is O(|domains|) comparisons PER ROW and O(|domains|) generated
  *    code, which is exactly why it cannot be the only shape: a
  *    web-scale corpus keyed by registered domain (100k+) would pay a
  *    100k-branch linear scan per row and blow the generated method past
  *    JIT/codegen limits into interpreted fallback (round-9 verdict #3).
  *
  *  - **Broadcast lookup join** (> `chainMax`): the attribute table ships
  *    as a broadcast left join keyed null-safely on the domain — O(1)
  *    hash probe per row, bounded generated code, and NO exchange on the
  *    corpus side (a broadcast join adds none), so the "no shuffle"
  *    property of every caller survives unchanged.
  *
  * Unmatched domains yield NULL in every attribute column under BOTH
  * shapes (callers `coalesce` their own defaults), and matching is
  * null-safe (`<=>`) under both, so the shapes are exchangeable row for
  * row. The threshold reads the runtime conf `graft.domain.chainMax`
  * (default [[DomainLookup.DefaultChainMax]]) so tests pin either shape
  * explicitly. */
object DomainLookup {

  /** Chain/join switchover. 128 keeps the generated when-chain far below
    * codegen's method-size cliffs (CodegenRegressionSpec-gated at exactly
    * this cardinality) while covering every hand-written mixing spec. */
  val DefaultChainMax = 128

  /** Runtime conf key overriding [[DefaultChainMax]] (tests force one
    * shape with 0 / a large value; production never needs to). */
  val ChainMaxConf = "graft.domain.chainMax"

  /** Hard cap on |rows|. The join shape's no-corpus-exchange contract
    * holds ONLY while the lookup side actually broadcasts: past Spark's
    * 8 GB broadcast-relation hard limit, Catalyst would silently plan a
    * sort-merge join and every caller's no-shuffle property breaks. At
    * ~100 bytes per (domain, attrs) row, 16M rows is ~1.6 GB — well
    * under the limit with headroom for wide attribute sets — and far
    * beyond any real registered-domain table (the web has ~350M
    * registered domains, but a MIXING config keyed on more than 16M of
    * them is a driver-held Seq and died long before this require).
    * Larger per-key state belongs in a real join, declared as one. */
  val MaxRows: Int = 16 << 20

  private def litOf(v: Any, dt: DataType): Column =
    ColumnBridge.column(Literal.create(v, dt))

  /** Attach `valueCols` (name, type) to `df`, keyed by `domainExpr` of
    * type `domType`; `rows` maps each domain value to its attribute
    * values in `valueCols` order. Column names must be fresh in `df`. */
  def attach(df: DataFrame, domainExpr: Column, domType: DataType,
             rows: Seq[(Any, Seq[Any])],
             valueCols: Seq[(String, DataType)]): DataFrame = {
    val spark = df.sparkSession
    require(rows.size <= MaxRows,
      s"attach: ${rows.size} lookup rows exceeds MaxRows=$MaxRows — " +
        "past the broadcast envelope this would silently become a " +
        "sort-merge join; model per-key state that large as a real join")
    // duplicate domain keys would make the two shapes DIVERGE — the
    // when-chain keeps the last entry, the join duplicates corpus rows —
    // so they are a caller bug, refused loudly rather than resolved
    val keys = rows.map(_._1)
    require(keys.distinct.size == keys.size,
      s"attach: duplicate domain keys in lookup rows: " +
        keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
          .mkString(", "))
    val chainMax = spark.conf.getOption(ChainMaxConf)
      .map(_.toInt).getOrElse(DefaultChainMax)
    if (rows.size <= chainMax) {
      valueCols.zipWithIndex.foldLeft(df) { case (acc, ((name, dt), i)) =>
        val e = rows.foldLeft(litOf(null, dt)) { case (a, (dom, vals)) =>
          when(domainExpr <=> litOf(dom, domType), litOf(vals(i), dt))
            .otherwise(a)
        }
        acc.withColumn(name, e)
      }
    } else {
      val schema = StructType(
        StructField("__lk_dom", domType, nullable = true) +:
          valueCols.map { case (n, dt) => StructField(n, dt, nullable = true) })
      val lkp = spark.createDataFrame(
        rows.map { case (dom, vals) => Row.fromSeq(dom +: vals) }.asJava,
        schema)
      df.join(broadcast(lkp), domainExpr <=> col("__lk_dom"), "left")
        .drop("__lk_dom")
    }
  }
}
