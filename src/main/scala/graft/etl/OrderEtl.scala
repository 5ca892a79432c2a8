package graft.etl

import graft.functions.CleanExprs
import graft.operators.Upsert
import graft.sources.CsvIngest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The order-export ETL — the reference's `etl/order_info_etl.py` main path
  * (SURVEY.md §3.1) as one declarative Spark job:
  *
  *   raw CSV → normalize/derive (narrow, no shuffle) → staging frame →
  *   dim upserts (broadcast anti-joins) → dim_date merge → fact load
  *   (broadcast inner joins + null-rejecting filters).
  *
  * The reference's pandas-process/SQL-Server split collapses into a single
  * DAG; its ODBC batching (1000-row fast_executemany) is obviated by
  * parallel partitioned writes.
  */
object OrderEtl {

  /** The warehouse state threaded through upserts — immutable frames
    * standing in for the reference's mutable SQL Server tables. */
  final case class Warehouse(dimDate: DataFrame, dimCustomer: DataFrame,
                             dimProduct: DataFrame, dimPlatform: DataFrame,
                             factSales: DataFrame)

  def emptyWarehouse(spark: SparkSession): Warehouse = {
    // empty LocalRelation, NOT emptyRDD: Catalyst's PropagateEmptyRelation
    // recognizes it and folds away the first batch's anti-joins/unions/max
    // aggregates against the empty dims (an ExternalRDDScan is opaque —
    // measured ~1.2s of driver-side jobs + extra stages per ETL query)
    def empty(s: StructType): DataFrame =
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), s)
    Warehouse(empty(SalesSchemas.dimDate), empty(SalesSchemas.dimCustomer),
      empty(SalesSchemas.dimProduct), empty(SalesSchemas.dimPlatform),
      empty(SalesSchemas.factSales))
  }

  /** Which timestamp is the "sale date" (etl/order_info_etl.py:26). */
  val FactDateSource = "submitTime"

  private val renameMap = Map(
    "Urgent_Orders" -> "urgent_orders", "Batch_Number" -> "batch_number",
    "Serial_Number" -> "serial_number", "Inventory_Type" -> "inventory_type")

  /** Steps 1-3 of the reference main: normalize headers, clean key fields,
    * derive typed columns. Pure narrow transformations.
    * `injectedCols` = columns CsvIngest.ensureColumns added as all-NULL
    * (drives pandas-parity "None" vs "nan" hash stringification). */
  def cleanOrders(raw: DataFrame, injectedPre: Set[String] = Set.empty): DataFrame = {
    // TWO projections total (ensure-missing + derive): every withColumn is
    // a full analyzer pass over a 44-column plan, and the original
    // ~12-withColumn chain cost ~0.5s of driver time per ETL query
    val renamed = CsvIngest.renameIfPresent(raw, renameMap)
    val (base, injected) = CsvIngest.ensureColumns(renamed,
      Seq("name", "oneAddress", "postalCode", "masterSku", "sku"))
    val allInjected = injectedPre ++ injected
    val has = base.columns.toSet
    val tsCols = Seq("createTime", "submitTime", "deliveryTime", "pickingTime")

    // replace-in-place for existing columns:
    // P5 timestamps (trim tabs/whitespace, format-first parse, NULL on bad);
    // P8 goodsNumber → int, default 1
    val passthrough: Seq[Column] = base.columns.toSeq.map {
      case c if tsCols.contains(c) => CleanExprs.parseTs(col(c)).as(c)
      case "goodsNumber" => CleanExprs.intWithDefault(col("goodsNumber"), 1).as("goodsNumber")
      case c => col(c)
    }
    val missingTs = tsCols.filterNot(has).map(c => lit(null).cast(TimestampType).as(c))
    val goodsIfMissing = if (has("goodsNumber")) Nil else Seq(lit(1).as("goodsNumber"))
    val derived: Seq[Column] = Seq(
      // P6: unit-suffixed numerics
      (if (has("volume")) CleanExprs.numFromUnitStr(col("volume"))
       else lit(null).cast(DoubleType)).as("volume_num"),
      (if (has("actualWeight")) CleanExprs.numFromUnitStr(col("actualWeight"))
       else lit(null).cast(DoubleType)).as("actualWeight_num"),
      // P7: state_code — column-level preference: State if the column
      // exists, else houseNo (the reference does NOT fall through per-row,
      // etl/order_info_etl.py:209-216)
      (if (has("State")) CleanExprs.stateCode(col("State"))
       else if (has("houseNo")) CleanExprs.stateCode(col("houseNo"))
       else lit(null).cast(StringType)).as("state_code"),
      // P9: stable customer id over (name, oneAddress, postalCode); missing
      // column ⇒ "None", missing cell ⇒ "nan" (pandas stringification parity)
      CleanExprs.stableIdWithNulls(Seq("name", "oneAddress", "postalCode").map { c =>
        col(c) -> (if (allInjected.contains(c)) "None" else "nan")
      }).as("customer_id"),
      // P10: product key = first non-blank of (masterSku, sku)
      CleanExprs.firstNonBlank(col("masterSku"), col("sku")).as("product_key"))
    base.select(passthrough ++ missingTs ++ goodsIfMissing ++ derived: _*)
  }

  /** Staging projection: the 39 raw + 5 derived columns, string lengths
    * truncated to DDL widths (S9), audit load_ts stamped (S8). */
  def toStaging(cleaned: DataFrame): DataFrame = {
    val (df, _) = CsvIngest.ensureColumns(cleaned,
      SalesSchemas.stagingRawCols ++ SalesSchemas.stagingDerivedCols)
    // one projection: per-column truncation folded into the staging select
    // (a withColumn per length-map entry = 37 analyzer passes)
    val proj = (SalesSchemas.stagingRawCols ++ SalesSchemas.stagingDerivedCols).map { c =>
      SalesSchemas.stagingLengthMap.get(c) match {
        case Some(n) if df.schema(c).dataType == StringType =>
          CleanExprs.truncateTo(col(c), n).as(c)
        case _ => col(c)
      }
    }
    df.select(proj :+ current_timestamp().as("load_ts"): _*)
  }

  /** Steps 4-8: dim upserts + fact load. Every dim join broadcasts (dims
    * are KB-MB scale); the fact side streams through unshuffled. */
  def loadWarehouse(wh: Warehouse, stg: DataFrame): Warehouse = {
    // The four dim upserts each need 1-3 staging columns; materialize ONE
    // narrow projection instead of recomputing the upstream pipeline per
    // consumer (measured: halves the ETL wall time at sf0.1 when staging
    // is itself derived from joins). The fact load below still streams
    // the full staging once. ~6 small columns ⇒ MB-scale cache even for
    // very large batches; at cluster scale this would be the staging
    // table's column-pruned parquet scan instead.
    val dimKeys = stg.select(col("orderNo"), col("commercePlatform"),
        col("product_key"), col("customer_id"), col("state_code"),
        col("postalCode"), col("goodsNumber"), col(FactDateSource))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4) dim_platform upsert (etl/order_info_etl.py:410-417)
    val newPlatforms = dimKeys
      .where(col("commercePlatform").isNotNull && col("commercePlatform") =!= "")
      .select(col("commercePlatform").as("platform_name")).distinct()
      .join(broadcast(wh.dimPlatform.select("platform_name")), Seq("platform_name"), "left_anti")
    val maxPlat = maxId(wh.dimPlatform, "platform_id")
    val dimPlatform = wh.dimPlatform.unionByName(
      Upsert.withSurrogateKeys(newPlatforms, "platform_id", Seq(col("platform_name")), maxPlat)
        .select(col("platform_id"), col("platform_name")))

    // 5) dim_product insert (attrs NULL — enrichment comes from ProductEtl)
    val newProducts = dimKeys
      .where(col("product_key").isNotNull && col("product_key") =!= "")
      .select(col("product_key").as("main_sku_code")).distinct()
      .join(broadcast(wh.dimProduct.select("main_sku_code")), Seq("main_sku_code"), "left_anti")
      .withColumn("english_name", lit(null).cast(StringType))
      .withColumn("chinese_name", lit(null).cast(StringType))
      .withColumn("customer_code", lit(null).cast(StringType))
      .withColumn("category", lit(null).cast(StringType))
      .withColumn("subcategory", lit(null).cast(StringType))
    val dimProduct = wh.dimProduct.unionByName(
      Upsert.withSurrogateKeys(newProducts, "product_id", Seq(col("main_sku_code")),
        maxId(wh.dimProduct, "product_id"))
        .select(wh.dimProduct.columns.map(col): _*))

    // 6) dim_customer insert + state/postal backfill. The reference's
    // DISTINCT (customer_id, state, postal) would PK-collide on conflicting
    // attrs; we keep the first row per id ordered by (state, postal) for
    // determinism.
    val custRows = dimKeys.where(col("customer_id").isNotNull)
      .select(col("customer_id"), lit("Unknown").as("gender"),
        col("state_code"), col("postalCode").as("postal_code"))
      .distinct()
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("customer_id"))
          .orderBy(col("state_code").asc_nulls_last, col("postal_code").asc_nulls_last)))
      .where(col("__rn") === 1).drop("__rn")
    val insertedCust = wh.dimCustomer.unionByName(
      custRows.join(broadcast(wh.dimCustomer.select("customer_id")), Seq("customer_id"), "left_anti"))
    val dimCustomer = Upsert.guardedOverwrite(insertedCust, custRows,
      keys = Seq("customer_id"), attrs = Seq("state_code", "postal_code"),
      guard = d => d("state_code").isNull || d("postal_code").isNull)

    // 7) dim_date covers the staging submitTime range (MERGE NOT MATCHED)
    val calendar = DimDate.fromColumnRange(
      dimKeys.where(col(FactDateSource).isNotNull), FactDateSource)
    val dimDate = wh.dimDate.unionByName(
      calendar.join(broadcast(wh.dimDate.select("date_id")), Seq("date_id"), "left_anti"))

    // 8) fact load: broadcast joins + the reference's null-rejecting
    // filters (LEFT JOIN + IS NOT NULL ⇒ written as inner, SURVEY §7.4)
    // fact consumes the same 8 columns — the cached frame covers it, so
    // the full staging pipeline is computed exactly once per batch
    val fact = dimKeys
      .where(col(FactDateSource).isNotNull &&
        col("commercePlatform").isNotNull && col("product_key").isNotNull)
      .join(broadcast(dimPlatform), col("platform_name") === col("commercePlatform"))
      .join(broadcast(dimProduct.select(col("product_id"), col("main_sku_code"))),
        col("main_sku_code") === col("product_key"))
      .select(
        monotonically_increasing_id().as("fact_id"), // IDENTITY analog: unique, not contiguous — a global sequence is a scale anti-pattern
        col("orderNo").as("order_id"),
        to_date(col(FactDateSource)).as("date_id"),
        col("product_id"),
        col("customer_id"),
        col("platform_id"),
        coalesce(col("goodsNumber"), lit(1)).cast(IntegerType).as("units"),
        lit(BigDecimal(0.00)).cast(DecimalType(18, 2)).as("revenue"),
        col("state_code"))
    Warehouse(dimDate, dimCustomer, dimProduct, dimPlatform,
      wh.factSales.unionByName(fact))
  }

  private def maxId(df: DataFrame, idCol: String): Long = {
    val r = df.agg(max(col(idCol))).first()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Full pipeline from a CSV path against an existing warehouse. */
  def run(spark: SparkSession, csvPath: String, wh: Warehouse): Warehouse = {
    val raw = CsvIngest.readAllString(spark, csvPath)
    loadWarehouse(wh, toStaging(cleanOrders(raw)))
  }
}
