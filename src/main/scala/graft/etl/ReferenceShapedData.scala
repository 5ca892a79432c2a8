package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a reference-shaped order-export frame (all-string, messy)
  * from the TPC-H-ish testdata, deterministically — so the ENTIRE
  * OrderEtl path (P5-P10 cleaning, hash keys, staging, dim upserts, fact
  * load with null-rejecting joins) can be oracle-checked against DuckDB
  * on 60k+ rows, not just unit fixtures.
  *
  * Injected mess (each exercises a cleaning rule):
  *  - submitTime is literal 'garbage' for l_linenumber = 7 rows → P5 NULL
  *    → dropped by the fact load's date filter;
  *  - commercePlatform is '' when o_orderkey % 50 = 0 → dropped by the
  *    platform filter + anti-join insert's <> '' guard;
  *  - masterSku is blank when l_partkey % 97 = 0, falling back to the
  *    sku column (P10 coalesce);
  *  - State is junk text when c_nationkey % 7 = 3 → P7 NULL state_code;
  *  - goodsNumber is 'junk' when l_quantity > 45 → P8 default 1.
  */
object ReferenceShapedData {

  def syntheticOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    // The single-row-group fixture reads as ONE scan task; the cleaning
    // pass above this frame is the ETL's dominant per-row compute, so
    // split the probe side explicitly (orders/customer broadcast against
    // it). See Tables.splitOnRead for the full story.
    val l = Tables.lineitem(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val joined = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
    val stateCode = concat(
      chr(lit(65) + col("c_nationkey") % 26),
      chr(lit(65) + (col("c_nationkey") * 7) % 26))
    joined.select(
      concat(lit("ORD-"), col("o_orderkey"), lit("-"), col("l_linenumber")).as("orderNo"),
      when(col("o_orderkey") % 50 === 0, lit(""))
        .otherwise(concat(lit("PLAT_"), col("o_orderpriority").substr(1, 1))).as("commercePlatform"),
      col("c_name").as("name"),
      concat(lit("ADDR_"), col("c_custkey")).as("oneAddress"),
      lpad((col("c_custkey") % 100000).cast("string"), 5, "0").as("postalCode"),
      when(col("c_nationkey") % 7 === 3, lit("not a state"))
        .otherwise(stateCode).as("State"),
      when(col("l_partkey") % 97 === 0, lit(" "))
        .otherwise(concat(lit("SKU-"), col("l_partkey"))).as("masterSku"),
      concat(lit("ALT-"), col("l_partkey")).as("sku"),
      when(col("l_linenumber") === 7, lit("garbage"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")).as("submitTime"),
      when(col("l_quantity") > 45, lit("junk"))
        .otherwise(col("l_quantity").cast("int").cast("string")).as("goodsNumber"))
  }

  /** The full ETL on the synthetic frame: clean → staging → warehouse.
    *
    * Deliberately NOT cached: the five staging consumers (4 dim upserts +
    * fact) are each column-pruned by Catalyst down to a handful of the 44
    * staging columns, so recomputing the narrow pipeline per consumer is
    * cheaper than materializing all columns (measured: persist made the
    * pair 13.9s+2.5s vs 8.9s+4.9s uncached at sf0.1). At cluster scale the
    * equivalent choice is a columnar parquet staging table — which gives
    * BOTH materialization and per-consumer column pruning (what
    * [[graft.sources.WarehouseStore]] provides). */
  def warehouse(spark: SparkSession, sfDir: String): OrderEtl.Warehouse = {
    val raw = syntheticOrders(spark, sfDir)
    OrderEtl.loadWarehouse(OrderEtl.emptyWarehouse(spark),
      OrderEtl.toStaging(OrderEtl.cleanOrders(raw)))
    // NB: also measured with dims persisted — net loss (materializing full
    // dim rows defeats the count-only column pruning q35 relies on).
  }

  private val persisted = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Durable-warehouse path for `sfDir`: the ETL runs and saves ONCE per
    * JVM; every dashboard query after that reads the partitioned parquet
    * back. This is the reference's own architecture — Power BI queries the
    * durable SQL DB (sql/schema/fact_sales.Table.sql), it does not re-run
    * the ETL per visual — and the scale story: the ETL's fixed cost is
    * paid at load time, reporting reads are pruned scans. */
  def persistedWarehousePath(spark: SparkSession, sfDir: String): String =
    persisted.computeIfAbsent(sfDir, _ => {
      val f = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_dashwh_${Integer.toHexString(sfDir.hashCode)}")
      // save then VACUUM (not deleteDirectory): the staged save never
      // deletes superseded files, so the deterministic dir would
      // accumulate one full warehouse copy per JVM; vacuum reclaims
      // everything the fresh manifest doesn't list — including a
      // pre-manifest layout left by an older build — while a
      // concurrent reader of the committed manifest keeps a complete
      // file-set (a directory delete would yank files mid-query)
      graft.sources.WarehouseStore.save(warehouse(spark, sfDir),
        f.getAbsolutePath)
      graft.sources.WarehouseStore.vacuumWarehouse(spark, f.getAbsolutePath)
      f.getAbsolutePath
    })

  /** DuckDB CTEs reproducing syntheticOrders + the cleaning pass — shared
    * prefix of the two ETL oracle queries. */
  val oracleCtes: String =
    """src AS (
        SELECT 'ORD-' || o_orderkey || '-' || l_linenumber AS orderNo,
          CASE WHEN o_orderkey % 50 = 0 THEN ''
               ELSE 'PLAT_' || substring(o_orderpriority, 1, 1) END AS commercePlatform,
          c_name AS name,
          'ADDR_' || c_custkey AS oneAddress,
          lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS postalCode,
          CASE WHEN c_nationkey % 7 = 3 THEN 'not a state'
               ELSE chr(65 + c_nationkey % 26) || chr(65 + (c_nationkey * 7) % 26) END AS state_raw,
          CASE WHEN l_partkey % 97 = 0 THEN ' ' ELSE 'SKU-' || l_partkey END AS masterSku,
          'ALT-' || l_partkey AS sku,
          CASE WHEN l_linenumber = 7 THEN 'garbage'
               ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS submitTime,
          CASE WHEN l_quantity > 45 THEN 'junk'
               ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS goodsNumber
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey),
      stg AS (
        SELECT orderNo, commercePlatform,
          COALESCE(TRY_STRPTIME(submitTime, '%Y-%m-%d %H:%M:%S'),
                   TRY_CAST(submitTime AS TIMESTAMP)) AS submitTime,
          CASE WHEN regexp_matches(upper(trim(state_raw)), '^[A-Z]{2}$')
               THEN upper(trim(state_raw)) END AS state_code,
          COALESCE(CAST(TRY_CAST(goodsNumber AS DOUBLE) AS INTEGER), 1) AS goodsNumber,
          CAST(CAST(('0x' || substring(md5(name || '|' || oneAddress || '|' || postalCode), 1, 16)) AS UBIGINT)
               % 9223372036854775808 AS BIGINT) AS customer_id,
          COALESCE(NULLIF(trim(masterSku), ''), NULLIF(trim(sku), '')) AS product_key
        FROM src),
      fact AS (
        SELECT * FROM stg
        WHERE submitTime IS NOT NULL AND commercePlatform IS NOT NULL
          AND commercePlatform <> '' AND product_key IS NOT NULL)"""
}
