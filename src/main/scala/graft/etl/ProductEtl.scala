package graft.etl

import graft.functions.CleanExprs
import graft.operators.Upsert
import graft.sources.CsvIngest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-master enrichment ETL — the reference's `etl/product_info_etl.py`
  * (SURVEY.md §3.2): auto-map heterogeneous headers, derive the product
  * key, build the product staging projection, then upsert + enrich
  * `dim_product`.
  */
object ProductEtl {

  /** Header auto-mapping + product-key derivation
    * (product_info_etl.py:192-258). */
  def cleanProducts(raw: DataFrame): DataFrame = {
    val mapped = CsvIngest.autoMap(
      CsvIngest.autoMap(raw, "masterSku", Seq("mainskucode")),
      "sku", Seq("second_sku"))
    val (withSkus, _) = CsvIngest.ensureColumns(mapped, Seq("masterSku", "sku"))
    withSkus.withColumn("product_key",
      CleanExprs.firstNonBlank(col("masterSku"), col("sku")))
  }

  /** Staging projection (product_info_etl.py:296-321): fuzzy-discovered
    * attribute columns, whitespace scrub, DDL-width truncation, null-key
    * rows dropped. */
  def toStaging(cleaned: DataFrame): DataFrame = {
    def fuzzy(needles: Seq[String]): Column =
      CsvIngest.findFuzzy(cleaned, needles)
        .map(c => CleanExprs.scrub(col(c)))
        .getOrElse(lit(null).cast(StringType))
    cleaned
      .select(
        CleanExprs.scrub(col("product_key")).as("main_sku_code"),
        fuzzy(Seq("english", "name")).as("english_name"),
        fuzzy(Seq("chinese", "name")).as("chinese_name"),
        fuzzy(Seq("customer", "code")).as("customer_code"),
        lit(null).cast(StringType).as("category"))
      .where(col("main_sku_code").isNotNull)
      .select(
        CleanExprs.truncateTo(col("main_sku_code"), 120).as("main_sku_code"),
        CleanExprs.truncateTo(col("english_name"), 255).as("english_name"),
        CleanExprs.truncateTo(col("chinese_name"), 255).as("chinese_name"),
        CleanExprs.truncateTo(col("customer_code"), 100).as("customer_code"),
        CleanExprs.truncateTo(col("category"), 100).as("category"))
  }

  /** Upsert into dim_product: anti-join insert of unseen SKUs, then enrich
    * existing rows with COALESCE(staging, dim) — update side wins where it
    * has a value (product_info_etl.py:364-386). */
  def upsertDimProduct(dimProduct: DataFrame, stg: DataFrame): DataFrame = {
    val distinctStg = stg
      .where(col("main_sku_code").isNotNull && col("main_sku_code") =!= "")
      .dropDuplicates("main_sku_code")
    val newRows = distinctStg
      .join(broadcast(dimProduct.select("main_sku_code")), Seq("main_sku_code"), "left_anti")
      .withColumn("subcategory", lit(null).cast(StringType))
    val maxId = {
      val r = dimProduct.agg(max(col("product_id"))).first()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val inserted = dimProduct.unionByName(
      Upsert.withSurrogateKeys(newRows, "product_id", Seq(col("main_sku_code")), maxId)
        .select(dimProduct.columns.map(col): _*))
    Upsert.coalesceUpdate(inserted, distinctStg, keys = Seq("main_sku_code"),
      attrs = Seq("english_name", "chinese_name", "customer_code", "category"),
      preferUpdate = true)
  }

  /** Full pipeline from a CSV path against an existing dim_product. */
  def run(spark: SparkSession, csvPath: String, dimProduct: DataFrame): DataFrame = {
    val raw = CsvIngest.readAllString(spark, csvPath)
    upsertDimProduct(dimProduct, toStaging(cleanProducts(raw)))
  }
}
