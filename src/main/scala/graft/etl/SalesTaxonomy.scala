package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's product taxonomy, re-expressed rule-for-rule
  * (/root/reference/sql/transformations/10_dim_product_category_rules.sql
  * and 30_dim_product_subcategory_rules_furniture.sql).
  *
  * Faithfulness notes:
  *  - SQL Server LIKE is case-insensitive under the default collation, so
  *    every match here lowercases first (the reference itself mixes bare
  *    LIKE and LOWER(...) LIKE; see SURVEY.md §7.4);
  *  - pass 2's CASE has ELSE 'Other' *inside* a WHERE category IS NULL
  *    update — so after pass 2 no NULL category remains except rows the
  *    ETL never touched (pass 4 backstops those);
  *  - '10*12%' is a literal asterisk in T-SQL LIKE (only % and _ are
  *    wildcards) — same in Spark's like();
  *  - pass ordering is semantics: each pass sees the previous pass's
  *    writes (sequential UPDATEs → threaded when-chains).
  */
object SalesTaxonomy {

  import Taxonomy.{Rule, pass, passWhereNull}

  /** Category rules over (main_sku_code, english_name, category). */
  def withCategory(dim: DataFrame): DataFrame = {
    val sku = lower(col("main_sku_code"))
    val nm = lower(col("english_name"))

    // Pass 1 — SKU prefixes, only where NULL (10_...sql:20-30)
    val p1 = passWhereNull(col("category"), Seq(
      Rule(sku.like("cn%") || sku.like("nb%"), "Furniture"),
      Rule(sku.like("hz%"), "Outdoor & Garden"),
      Rule(sku.like("sz%"), "Automotive"),
      Rule(sku.like("hifine%"), "Spare Parts")))

    // Pass 2 — name keywords, only where still NULL; ELSE 'Other'
    // (10_...sql:33-65). NULL english_name also lands in 'Other' (CASE
    // with NULL input matches no WHEN).
    val p2 = when(p1.isNotNull, p1).otherwise(pass(lit("Other"), Seq(
      Rule(nm.like("%sofa%") || nm.like("%chair%") || nm.like("%table%") ||
        nm.like("%bench%") || nm.like("%mattress%") || nm.like("%cabinet%"), "Furniture"),
      Rule(nm.like("%gazebo%") || nm.like("%garden%"), "Outdoor & Garden"),
      Rule(nm.like("%car%") || nm.like("%spoiler%"), "Automotive"),
      Rule(nm.like("%light%"), "Lighting"),
      Rule(nm.like("%spare%"), "Spare Parts"),
      Rule(nm.like("%storage%"), "Storage & Organization"))))

    // Pass 3 — unconditional targeted overrides (10_...sql:68-96)
    val p3 = pass(p2, Seq(
      Rule(sku.like("cn1139-%"), "Automotive"),
      Rule(nm.like("%bumper diffuser%") || nm.like("%rear bumper diffuser%") ||
        nm.like("%running boards%"), "Automotive"),
      Rule(nm.like("%wafer light%") || nm.like("%mounting plate%") ||
        nm.like("%led panel light%") || nm.like("%panel light%"), "Lighting"),
      Rule(nm.like("%gazebo%") || nm.like("%pergola%") || nm.like("10*12%") ||
        nm.like("%metal roof%"), "Outdoor & Garden"),
      Rule(nm.like("%loading ramp%") || nm.like("%loading ramps%") ||
        nm.like("%ramp%") || (nm === "rack"), "Storage & Organization")))

    // Pass 4 — backstop (10_...sql:99-102)
    dim.withColumn("category", coalesce(p3, lit("Other")))
  }

  /** Subcategory rules; requires category already populated. */
  def withSubcategory(dim: DataFrame): DataFrame = {
    val nm = lower(col("english_name"))
    val emptySub = col("subcategory").isNull || trim(col("subcategory")) === ""

    // A — Outdoor & Garden, only when empty (30_...sql:20-36)
    val a = when(col("category") === "Outdoor & Garden" && emptySub,
      pass(lit("Other Outdoor"), Seq(
        Rule(nm.like("%gazebo%") || nm.like("%pergola%"), "Gazebo / Pergola"),
        Rule(nm.like("%patio%") || nm.like("%outdoor%"), "Patio / Outdoor"),
        Rule(nm.like("%garden%") || nm.like("%planter%") || nm.like("%raised bed%"), "Garden"),
        Rule(nm.like("%fire pit%") || nm.like("%heater%"), "Heating"),
        Rule(nm.like("%umbrella%"), "Umbrella"),
        Rule(nm.like("%grill%") || nm.like("%bbq%"), "Grill / BBQ"),
        Rule(nm.like("%swing%") || nm.like("%hammock%"), "Swing / Hammock"),
        Rule(nm.like("%pool%") || nm.like("%spa%"), "Pool / Spa"))))
      .otherwise(col("subcategory"))

    // B — Furniture baseline, only when empty (30_...sql:39-53)
    val b = when(col("category") === "Furniture" && emptySub,
      pass(lit("Other Furniture"), Seq(
        Rule(nm.like("%sofa%"), "Sofa"),
        Rule(nm.like("%chair%"), "Chair"),
        Rule(nm.like("%table%"), "Table"),
        Rule(nm.like("%cabinet%"), "Cabinet"),
        Rule(nm.like("%bench%"), "Bench"),
        Rule(nm.like("%mattress%"), "Mattress"))))
      .otherwise(a)

    // C — refine only rows still 'Other Furniture' (30_...sql:56-115)
    val c = when(col("category") === "Furniture" && b === "Other Furniture",
      pass(lit("Other Furniture"), Seq(
        Rule(nm.like("%bed frame%") || nm.like("%bed%"), "Bed"),
        Rule(nm.like("%dining set%") || nm.like("%dining table%") || nm.like("%dining%"), "Dining Furniture"),
        Rule(nm.like("%coffee table%") || nm.like("%end table%") || nm.like("%side table%"), "Occasional Tables"),
        Rule(nm.like("%accent chair%"), "Accent Chair"),
        Rule(nm.like("%ottoman%"), "Ottoman"),
        Rule(nm.like("%loveseat%"), "Loveseat"),
        Rule(nm.like("%recliner%"), "Recliner"),
        Rule(nm.like("%chaise%"), "Chaise Lounge"),
        Rule(nm.like("%sectional%"), "Sectional Sofa"),
        Rule(nm.like("%daybed%"), "Daybed"),
        Rule(nm.like("%futon%"), "Futon"),
        Rule(nm.like("%console table%") || nm.like("%entry table%"), "Console Table"),
        Rule(nm.like("%tv stand%") || nm.like("%media%") || nm.like("%console%"), "TV Stand / Media Console"),
        Rule(nm.like("%wardrobe%") || nm.like("%closet%"), "Wardrobe"),
        Rule(nm.like("%dresser%") || nm.like("%chest%"), "Dresser"),
        Rule(nm.like("%nightstand%") || nm.like("%bedside%"), "Nightstand"),
        Rule(nm.like("%storage bench%"), "Storage Bench"),
        Rule(nm.like("%storage%") || nm.like("%organizer%"), "Storage Furniture"),
        Rule(nm.like("%bookshelf%") || nm.like("%shelf%"), "Shelving"),
        Rule(nm.like("%kids%") || nm.like("%child%"), "Kids Furniture"),
        Rule(nm.like("%set%") || nm.like("%bundle%"), "Furniture Sets"))))
      .otherwise(b)

    // D — remaining 'Other Furniture' → 'Furniture Sets & General'
    // (30_...sql:118-123)
    val d = when(col("category") === "Furniture" && c === "Other Furniture",
      lit("Furniture Sets & General")).otherwise(c)

    dim.withColumn("subcategory", d)
  }

  /** Run order 10 → 30 (10_...sql:12-16). */
  def apply(dimProduct: DataFrame): DataFrame =
    withSubcategory(withCategory(dimProduct))
}
