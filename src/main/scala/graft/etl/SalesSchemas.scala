package graft.etl

import org.apache.spark.sql.types._

/** Warehouse table schemas for the sales-analytics star schema, defined
  * once (SURVEY.md §1.2; DDL under /root/reference/sql/schema/ ).
  *
  * Types follow the DDL mapping in SURVEY.md §1.3: VARCHAR→String (with
  * write-time truncation, see [[OrderEtl.stagingLengthMap]]),
  * DECIMAL(18,2)→DecimalType(18,2), DATETIME2→Timestamp, BIT→Boolean.
  */
object SalesSchemas {

  /** Raw order-export staging columns, in DDL order
    * (/root/reference/etl/order_info_etl.py:318-324, sql/schema/
    * stg_order_export_raw.Table.sql:28-78). All text at the ingest edge;
    * ETL-derived columns are typed. */
  val stagingRawCols: Seq[String] = Seq(
    "orderNo", "orderType", "orderRealStatus", "platformOrderNo", "commercePlatform",
    "name", "country", "city", "postalCode", "contactNo", "urgent_orders",
    "oneReference", "twoReference", "oneAddress", "twoAddress", "houseNo",
    "masterSku", "email", "companyName", "volume", "actualWeight", "serviceProvider",
    "trackNo", "expressDeliveryService", "outBoundSource", "logisticsStatus",
    "trackNoReason", "createTime", "submitTime", "deliveryTime", "pickingTime",
    "sku", "batch_number", "serial_number", "goodsNumber", "inventory_type",
    "length", "width", "high", "remarks")

  /** Derived columns appended by the ETL before staging write. */
  val stagingDerivedCols: Seq[String] = Seq(
    "customer_id", "state_code", "volume_num", "actualWeight_num", "product_key")

  /** VARCHAR(n) truncation map — mirrors the 37-entry map at
    * /root/reference/etl/order_info_etl.py:332-343. */
  val stagingLengthMap: Map[String, Int] = Map(
    "orderNo" -> 100, "orderType" -> 100, "orderRealStatus" -> 50,
    "platformOrderNo" -> 100, "commercePlatform" -> 50, "name" -> 255,
    "country" -> 50, "city" -> 120, "postalCode" -> 20, "contactNo" -> 60,
    "urgent_orders" -> 50, "oneReference" -> 120, "twoReference" -> 120,
    "oneAddress" -> 255, "twoAddress" -> 255, "houseNo" -> 50, "masterSku" -> 100,
    "email" -> 255, "companyName" -> 255, "volume" -> 50, "actualWeight" -> 50,
    "serviceProvider" -> 50, "trackNo" -> 60, "expressDeliveryService" -> 100,
    "outBoundSource" -> 100, "logisticsStatus" -> 120, "trackNoReason" -> 255,
    "sku" -> 120, "batch_number" -> 120, "serial_number" -> 120,
    "inventory_type" -> 120, "length" -> 50, "width" -> 50, "high" -> 50,
    "remarks" -> 255, "state_code" -> 2, "product_key" -> 120)

  val dimDate: StructType = StructType(Seq(
    StructField("date_id", DateType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("quarter", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("month_name", StringType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("day_of_week", IntegerType, nullable = false),
    StructField("is_weekend", BooleanType, nullable = false),
    StructField("day_name", StringType)))

  val dimCustomer: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("gender", StringType),
    StructField("state_code", StringType),
    StructField("postal_code", StringType)))

  val dimProduct: StructType = StructType(Seq(
    StructField("product_id", LongType, nullable = false),
    StructField("main_sku_code", StringType, nullable = false),
    StructField("english_name", StringType),
    StructField("chinese_name", StringType),
    StructField("customer_code", StringType),
    StructField("category", StringType),
    StructField("subcategory", StringType)))

  val dimPlatform: StructType = StructType(Seq(
    StructField("platform_id", LongType, nullable = false),
    StructField("platform_name", StringType, nullable = false)))

  val factSales: StructType = StructType(Seq(
    StructField("fact_id", LongType, nullable = false),
    StructField("order_id", StringType),
    StructField("date_id", DateType),
    StructField("product_id", LongType),
    StructField("customer_id", LongType),
    StructField("platform_id", LongType),
    StructField("units", IntegerType, nullable = false),
    StructField("revenue", DecimalType(18, 2), nullable = false),
    StructField("state_code", StringType)))
}
