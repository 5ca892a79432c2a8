package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reporting semantic layer — `vw_sales_product_geo`
  * (/root/reference/sql/views/vw_sales_product_geo.View.sql:26-57):
  * fact_sales joined to dim_date / dim_product / dim_platform, INNER by
  * design (the ETL enforces referential integrity).
  *
  * All three dims broadcast; the fact never shuffles. At warehouse scale
  * the fact table would be date-partitioned parquet, making the date_id
  * filter a partition-pruning predicate.
  */
object SemanticView {

  def salesProductGeo(wh: OrderEtl.Warehouse): DataFrame =
    wh.factSales
      .join(broadcast(wh.dimDate), Seq("date_id"))
      .join(broadcast(wh.dimProduct), Seq("product_id"))
      .join(broadcast(wh.dimPlatform), Seq("platform_id"))
      .select(
        col("date_id").as("order_date"),
        col("day_of_week"), col("day_name"), col("is_weekend"),
        col("month"), col("month_name"), col("quarter"), col("year"),
        col("state_code"),
        col("category"), col("subcategory"),
        col("english_name").as("product_name"),
        col("platform_name").as("platform"),
        col("units"))
}
