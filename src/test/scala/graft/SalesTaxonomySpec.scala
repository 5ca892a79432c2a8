package graft

import graft.etl.SalesTaxonomy
import org.apache.spark.sql.functions._

/** Rule-ordering semantics of the reference taxonomy — each case pins a
  * trap where naive rule flattening would give a different answer
  * (cites into /root/reference/sql/transformations/). */
class SalesTaxonomySpec extends SparkSpec {
  import spark.implicits._

  private def classify(rows: (String, String)*): Map[String, (String, String)] = {
    val dim = rows.toSeq.toDF("main_sku_code", "english_name")
      .withColumn("category", lit(null).cast("string"))
      .withColumn("subcategory", lit(null).cast("string"))
    SalesTaxonomy(dim).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getString(3))).toMap
  }

  test("pass 3 override beats pass 1 prefix (CN1139-% ⇒ Automotive)") {
    // 10_...sql:74 — sim-racing items reclassified even though CN% ⇒ Furniture
    val got = classify(("CN1139-X", "Racing Chair Pro"))
    assert(got("CN1139-X")._1 == "Automotive")
    assert(got("CN1139-X")._2 == null) // no Automotive subcategory rules
  }

  test("pass B catches '%bench%' before pass C's 'storage bench' rule") {
    // 30_...sql:39-53 vs :99 — pass C only sees rows still 'Other Furniture'
    val got = classify(("NB400-D", "Storage Bench with Cushion"))
    assert(got("NB400-D") == ("Furniture", "Bench"))
  }

  test("pass C refines Other Furniture (bed frame ⇒ Bed)") {
    val got = classify(("NB500-E", "Platform Bed Frame Queen"))
    assert(got("NB500-E") == ("Furniture", "Bed"))
  }

  test("pass D renames the residue to Furniture Sets & General") {
    val got = classify(("NB600-F", "Unique Widget"))
    assert(got("NB600-F") == ("Furniture", "Furniture Sets & General"))
  }

  test("pass 3 pulls a pass-2 'Other' row into Lighting") {
    // no prefix, no pass-2 keyword, but '%mounting plate%' override fires
    val got = classify(("XQ-1", "Mounting Plate Kit"))
    assert(got("XQ-1")._1 == "Lighting")
  }

  test("outdoor subcategory rule order: patio beats heater") {
    // 30_...sql:24-27 — '%patio%' matches before '%heater%'
    val got = classify(("HZ9", "Patio Heater Deluxe"))
    assert(got("HZ9") == ("Outdoor & Garden", "Patio / Outdoor"))
  }

  test("case-insensitive matching (SQL Server collation semantics)") {
    val got = classify(("ZZ-1", "MODERN SOFA bed"))
    assert(got("ZZ-1") == ("Furniture", "Sofa"))
  }

  test("null name with prefix: category from SKU, subcategory backstop") {
    val got = classify(("CN777", null))
    assert(got("CN777") == ("Furniture", "Furniture Sets & General"))
  }

  test("null name, no prefix: pass-2 ELSE 'Other'") {
    val got = classify(("QQ-1", null))
    assert(got("QQ-1") == ("Other", null))
  }
}
