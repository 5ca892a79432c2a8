package graft.api

import graft.etl.OrderEtl.Warehouse
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` facade over the warehouse — compile-time field
  * checks for consumers who prefer case-class rows over dynamic `Row`s
  * (SURVEY.md §1.4: typed API where type safety pays; the dynamic ingest
  * edge stays DataFrame).
  */
object TypedSales {

  final case class FactSale(fact_id: Long, order_id: String,
                            date_id: java.sql.Date, product_id: Option[Long],
                            customer_id: Option[Long], platform_id: Option[Long],
                            units: Int, revenue: java.math.BigDecimal,
                            state_code: Option[String])
  final case class DimProduct(product_id: Long, main_sku_code: String,
                              english_name: Option[String], chinese_name: Option[String],
                              customer_code: Option[String], category: Option[String],
                              subcategory: Option[String])
  final case class DimPlatform(platform_id: Long, platform_name: String)
  final case class StateUnits(state_code: Option[String], units: Long)

  def facts(wh: Warehouse)(implicit s: SparkSession): Dataset[FactSale] = {
    import s.implicits._
    wh.factSales.as[FactSale]
  }

  def products(wh: Warehouse)(implicit s: SparkSession): Dataset[DimProduct] = {
    import s.implicits._
    wh.dimProduct.as[DimProduct]
  }

  /** Typed sum with map-side combine (an `Aggregator`, not `mapGroups` —
    * mapGroups shuffles every row; an Aggregator partial-aggregates like
    * any SQL sum and stays scale-safe). */
  private val unitsSum =
    new org.apache.spark.sql.expressions.Aggregator[FactSale, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, f: FactSale): Long = b + f.units
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(r: Long): Long = r
      override def bufferEncoder = org.apache.spark.sql.Encoders.scalaLong
      override def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
    }

  /** Typed equivalent of Dashboard.unitsByState's aggregation core. */
  def unitsByState(facts: Dataset[FactSale]): Dataset[StateUnits] = {
    import facts.sparkSession.implicits._
    facts.groupByKey(_.state_code)
      .agg(unitsSum.toColumn.name("units"))
      .map { case (k, u) => StateUnits(k, u) }
  }
}
