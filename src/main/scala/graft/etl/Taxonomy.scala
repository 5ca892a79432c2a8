package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based product taxonomy — the reference's 4+4 sequential T-SQL
  * UPDATE passes (/root/reference/sql/transformations/
  * 10_dim_product_category_rules.sql and
  * 30_dim_product_subcategory_rules_furniture.sql) re-expressed as
  * referentially-transparent when-chains.
  *
  * Pass-ordering IS the semantics (SURVEY.md §7.4): each UPDATE pass
  * observes the previous pass's writes, so each pass here threads the
  * previous pass's output expression through instead of re-reading the
  * base column. All matching is on `lower()` because SQL Server LIKE is
  * case-insensitive by default.
  */
object Taxonomy {

  /** One rule: guard → new value. */
  final case class Rule(cond: Column, value: String)

  /** One sequential pass: first matching rule wins; non-matching rows keep
    * `current` (T-SQL `UPDATE ... WHERE <guard>`). */
  def pass(current: Column, rules: Seq[Rule]): Column =
    rules.foldRight(current)((r, acc) => when(r.cond, lit(r.value)).otherwise(acc))

  /** Guarded pass that only touches rows where `current` IS NULL
    * (`UPDATE ... WHERE category IS NULL`). */
  def passWhereNull(current: Column, rules: Seq[Rule]): Column =
    when(current.isNull, pass(lit(null).cast("string"), rules)).otherwise(current)

  /** Demo taxonomy over the testdata `part` table, with the same rule
    * shapes as the reference: prefix-band rules → keyword fallback where
    * still NULL → unconditional override → 'Other' backstop; then a
    * subcategory refinement guarded to a single category. */
  def categorize(part: DataFrame): DataFrame = {
    val name = lower(col("p_name"))
    val typ = lower(col("p_type"))
    val brandNum = regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("int")

    // pass 1: "SKU-prefix" analog (brand number bands)
    val afterP1 = pass(lit(null).cast("string"), Seq(
      Rule(brandNum <= 15, "Metals"),
      Rule(brandNum.between(16, 35), "Finishes")))
    // pass 2: keyword fallback, only where still NULL
    val afterP2 = passWhereNull(afterP1, Seq(
      Rule(typ.like("%brass%") || typ.like("%steel%"), "Metals"),
      Rule(typ.like("%polished%") || typ.like("%brushed%"), "Finishes"),
      Rule(name.like("%blue%") || name.like("%navy%"), "Colorware")))
    // pass 3: unconditional targeted override (reference: CN1139-% ⇒
    // Automotive regardless of earlier passes, 10_...sql:68-96)
    val afterP3 = pass(afterP2, Seq(Rule(typ.like("%anodized%"), "Anodized")))
    // pass 4: backstop (10_...sql:99-102)
    val category = coalesce(afterP3, lit("Other"))

    // subcategory passes run only inside one category (mirrors the
    // furniture-only script guarding on category, 30_...sql:39-123)
    val subRules = pass(lit(null).cast("string"), Seq(
      Rule(typ.like("%brass%"), "Brass"),
      Rule(typ.like("%steel%"), "Steel"),
      Rule(typ.like("%copper%"), "Copper"),
      Rule(typ.like("%nickel%"), "Nickel"),
      Rule(typ.like("%tin%"), "Tin")))
    val subcategory = when(category === "Metals",
      coalesce(subRules, lit("Other Metals"))).otherwise(lit(null).cast("string"))

    part.withColumn("category", category).withColumn("subcategory", subcategory)
  }
}
