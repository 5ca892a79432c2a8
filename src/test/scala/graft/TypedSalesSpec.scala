package graft

import graft.api.TypedSales
import graft.etl.OrderEtl
import org.apache.spark.sql.functions._

/** Typed facade: Dataset[T] round-trip and Aggregator-based typed sum
  * agreeing with the untyped groupBy. */
class TypedSalesSpec extends SparkSpec {
  import spark.implicits._

  test("typed unitsByState equals untyped groupBy sum") {
    implicit val s = spark
    val fact = Seq(
      (1L, "O1", java.sql.Date.valueOf("2024-01-01"), Some(1L), Some(10L), Some(1L), 2, new java.math.BigDecimal("0.00"), Some("NJ")),
      (2L, "O2", java.sql.Date.valueOf("2024-01-02"), Some(1L), Some(11L), Some(1L), 3, new java.math.BigDecimal("0.00"), Some("NJ")),
      (3L, "O3", java.sql.Date.valueOf("2024-01-03"), Some(2L), Some(12L), Some(2L), 1, new java.math.BigDecimal("0.00"), None))
      .toDF("fact_id", "order_id", "date_id", "product_id", "customer_id",
        "platform_id", "units", "revenue", "state_code")
    val wh = OrderEtl.emptyWarehouse(spark).copy(factSales = fact)
    val typed = TypedSales.unitsByState(TypedSales.facts(wh))
      .collect().map(su => su.state_code -> su.units).toMap
    val untyped = fact.groupBy("state_code").agg(sum("units").as("u"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(typed == untyped)
    assert(typed(Some("NJ")) == 5L && typed(None) == 1L)
  }
}
