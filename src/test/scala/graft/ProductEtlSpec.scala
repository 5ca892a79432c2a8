package graft

import graft.etl.{OrderEtl, ProductEtl}
import graft.sources.CsvIngest
import org.apache.spark.sql.functions._

/** ProductEtl edges: header auto-mapping misses, COALESCE-enrichment
  * NULL semantics, and re-run idempotence. */
class ProductEtlSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDim = OrderEtl.emptyWarehouse(spark).dimProduct

  test("auto-map miss: no sku-ish headers → empty staging, no failure") {
    val raw = Seq(("x", "y")).toDF("foo", "bar")
    val stg = ProductEtl.toStaging(ProductEtl.cleanProducts(raw))
    assert(stg.count() == 0) // product_key all NULL → dropped
  }

  test("enrichment: staging NULL attr never clobbers an existing value") {
    val dim = Seq((1L, "SKU-1", "Old Name", null: String, null: String, "Furniture", null: String))
      .toDF("product_id", "main_sku_code", "english_name", "chinese_name",
        "customer_code", "category", "subcategory")
    // staging has NULL english_name but a new customer_code
    val stg = Seq(("SKU-1", null: String, null: String, "CUST9", null: String))
      .toDF("main_sku_code", "english_name", "chinese_name", "customer_code", "category")
    val out = ProductEtl.upsertDimProduct(dim, stg)
      .where(col("main_sku_code") === "SKU-1").collect().head
    assert(out.getAs[String]("english_name") == "Old Name") // COALESCE(s,p) keeps p
    assert(out.getAs[String]("customer_code") == "CUST9")   // new value wins
    assert(out.getAs[String]("category") == "Furniture")
  }

  test("idempotence: same staging twice → same dim, ids stable") {
    val stg = Seq(
      ("SKU-A", "Alpha", null: String, null: String, null: String),
      ("SKU-B", "Beta", null: String, null: String, null: String))
      .toDF("main_sku_code", "english_name", "chinese_name", "customer_code", "category")
    val once = ProductEtl.upsertDimProduct(emptyDim, stg)
    val twice = ProductEtl.upsertDimProduct(once, stg)
    val a = once.orderBy("product_id").collect().map(_.toSeq).toSeq
    val b = twice.orderBy("product_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(_(0)) == Seq(1L, 2L)) // deterministic surrogate ids by sku order
  }

  test("fuzzy attribute discovery is case/format tolerant") {
    val raw = Seq(("S1", "Nice Chair", "好椅子", "C77"))
      .toDF("mainSkuCode", "The English NAME col", "chinese-name", "CustomerCode")
    val normalized = raw.toDF(raw.columns.map(CsvIngest.normalizeColName): _*)
    val stg = ProductEtl.toStaging(ProductEtl.cleanProducts(normalized))
    val r = stg.collect().head
    assert(r.getAs[String]("main_sku_code") == "S1")
    assert(r.getAs[String]("english_name") == "Nice Chair")
    assert(r.getAs[String]("chinese_name") == "好椅子")
    assert(r.getAs[String]("customer_code") == "C77")
  }
}
