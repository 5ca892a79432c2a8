package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Power BI layer's queries as a typed API over the semantic view
  * (SURVEY.md §2.4 A7-A11, §2.5 W1-W2, plus the validation queries
  * A2-A4 from /root/reference/sql/transformations/90_validation_checks.sql).
  *
  * `view` is [[SemanticView.salesProductGeo]] output. All are
  * aggregate-then-window plans: the window's single-partition stage only
  * ever sees the (tiny) aggregated frame, never the fact rows.
  */
object Dashboard {

  /** Grand-total window over the AGGREGATED frame — the input is the
    * grouped result (|states|, |platforms| rows), never fact rows, so the
    * single-partition stage is deliberate and tiny.
    *
    * Two formulations, picked by group-key cardinality:
    *  - FEW groups (these dashboards): this window — ONE traversal of the
    *    expensive aggregate; the single-partition stage sees dozens of rows.
    *  - MANY groups (per-product/per-customer shares): use
    *    [[shareOfTotalBroadcast]] over a MATERIALIZED aggregate — the
    *    window would serialize millions of group rows through one task,
    *    while a scalar agg + broadcast join stays parallel. (Unmaterialized
    *    input would be traversed twice — measured slower here: q43 2.7s ->
    *    3.6s when this was a broadcast over the live ETL pipeline.)
    */
  private val grandTotal = Window.partitionBy()

  /** Share-of-total for HIGH-cardinality group keys: single-row total +
    * broadcast nested-loop join. Input should be materialized (cached or
    * a staging table) — it is traversed twice. */
  def shareOfTotalBroadcast(agg: DataFrame, valueCol: String,
                            outCol: String): DataFrame = {
    val tot = agg.agg(sum(col(valueCol)).as("__total"))
    agg.crossJoin(broadcast(tot))
      .withColumn(outCol, round(col(valueCol) / col("__total") * 100, 2))
      .drop("__total")
  }

  /** A7+W1: units by state with % of grand total (executive overview). */
  def unitsByState(view: DataFrame): DataFrame = {
    val agg = view.groupBy(col("state_code")).agg(sum(col("units")).as("units"))
    agg.withColumn("pct_of_total",
      round(col("units") / sum(col("units")).over(grandTotal) * 100, 2))
      .orderBy(col("units").desc)
  }

  /** A9+W1: units and share by platform. */
  def platformShare(view: DataFrame): DataFrame = {
    val agg = view.groupBy(col("platform")).agg(sum(col("units")).as("units"))
    agg.withColumn("platform_pct",
      round(col("units") / sum(col("units")).over(grandTotal) * 100, 2))
      .orderBy(col("units").desc)
  }

  /** A10: pivot matrix state × platform (named platforms as columns). */
  def platformByStatePivot(view: DataFrame, platforms: Seq[String]): DataFrame =
    view.where(col("platform").isInCollection(platforms))
      .groupBy(col("state_code"))
      .pivot("platform", platforms)
      .sum("units")
      .na.fill(0, platforms)

  /** A8: units per subcategory within a category (bar chart). */
  def subcategoryUnits(view: DataFrame, category: String): DataFrame =
    view.where(col("category") === category)
      .groupBy(col("subcategory")).agg(sum(col("units")).as("units"))
      .orderBy(col("units").desc)

  /** A11: day-of-week trend (Monday=1 ordering). */
  def dowTrend(view: DataFrame): DataFrame =
    view.groupBy(col("day_of_week"), col("day_name"))
      .agg(sum(col("units")).as("units"))
      .orderBy(col("day_of_week"))

  /** W2: leading platform per state (rank-1 within partition). */
  def platformRankByState(view: DataFrame): DataFrame = {
    val agg = view.groupBy(col("state_code"), col("platform"))
      .agg(sum(col("units")).as("units"))
    val w = Window.partitionBy(col("state_code"))
      .orderBy(col("units").desc, col("platform"))
    agg.withColumn("rank", row_number().over(w)).where(col("rank") === 1)
      .select(col("state_code"), col("platform"), col("units"))
  }

  // --- validation checks (90_validation_checks.sql) ---

  /** A2: SKU count per Furniture subcategory (90_...sql:17-24). */
  def skuCountPerSubcategory(dimProduct: DataFrame): DataFrame =
    dimProduct.where(col("category") === "Furniture")
      .groupBy(col("subcategory")).agg(count(lit(1)).as("sku_count"))
      .orderBy(col("sku_count").desc)

  /** A3: units sold per Furniture subcategory (90_...sql:27-35). */
  def unitsPerSubcategory(factSales: DataFrame, dimProduct: DataFrame): DataFrame =
    factSales.join(broadcast(dimProduct), Seq("product_id"))
      .where(col("category") === "Furniture")
      .groupBy(col("subcategory")).agg(sum(col("units")).as("units_sold"))
      .orderBy(col("units_sold").desc)

  /** A4: top-200 'Other Furniture' offenders by units (90_...sql:38-48). */
  def topOtherFurniture(factSales: DataFrame, dimProduct: DataFrame): DataFrame =
    factSales.join(broadcast(dimProduct), Seq("product_id"))
      .where(col("category") === "Furniture" && col("subcategory") === "Furniture Sets & General")
      .groupBy(col("english_name"), col("main_sku_code"))
      .agg(sum(col("units")).as("units_sold"))
      .orderBy(col("units_sold").desc, col("main_sku_code"))
      .limit(200)
}
