package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: a suite of checks evaluated
  * against a table in as few passes as the check types allow, producing a
  * tiny report frame `(check_name, target_col, violations, pass)` — the
  * contract gate a training-data pipeline runs before promoting a corpus
  * snapshot or warehouse load (the reference pipeline's NOT-NULL filters
  * and referential joins, generalized into an auditable report;
  * reference/sql/transformations/20_load_fact_sales.sql:21 drops bad
  * rows silently — this measures them).
  *
  * Scale shape, by check class:
  *   - ROW-LOCAL checks (not-null, range, set, regex) all fuse into ONE
  *     aggregate pass: a single narrow scan computes every violation
  *     count as a conditional sum, partial-aggregated map-side, so the
  *     exchange carries one row per task regardless of table size or
  *     check count.
  *   - UNIQUENESS shuffles only `(key, partial count)` — never the row —
  *     and reduces to one number per check.
  *   - REFERENTIAL checks anti-join the DISTINCT foreign-key values
  *     (≤ |distinct keys| rows move) against the reference side, which a
  *     dimension-sized ref makes a broadcast; the fact table itself never
  *     re-shuffles.
  * The report is ≤ |checks| rows — safe to collect, store, or alert on.
  */
object Expectations {

  sealed trait Expectation {
    /** Report key, stable across runs — alerting joins on it. */
    def checkName: String
    def targetCol: String
  }
  /** Column must contain no nulls. */
  final case class NotNull(column: String) extends Expectation {
    def checkName = "not_null"; def targetCol = column
  }
  /** Numeric column must lie in [lo, hi]; nulls don't violate (pair with
    * [[NotNull]] when they should). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    require(lo <= hi, s"in_range($column): empty range [$lo, $hi]")
    def checkName = "in_range"; def targetCol = column
  }
  /** Column value must be one of `values`; nulls don't violate. */
  final case class InSet(column: String, values: Seq[String])
      extends Expectation {
    require(values.nonEmpty,
      s"in_set($column): empty value set would flag every row")
    def checkName = "in_set"; def targetCol = column
  }
  /** String column must match `pattern` (substring semantics — anchor
    * with ^…$ for full-match); nulls don't violate. */
  final case class MatchesRegex(column: String, pattern: String)
      extends Expectation {
    def checkName = "matches_regex"; def targetCol = column
  }
  /** The column tuple must be unique across the table (nulls group as
    * values, exactly like GROUP BY); violations = rows beyond the first
    * per duplicated key. */
  final case class Unique(columns: Seq[String]) extends Expectation {
    def checkName = "unique"; def targetCol = columns.mkString(",")
  }
  /** Every non-null value must exist in `ref(refColumn)` (SQL FK
    * semantics: null FKs are legal). */
  final case class RefIntegrity(column: String, ref: DataFrame,
                                refColumn: String) extends Expectation {
    def checkName = "ref_integrity"; def targetCol = column
  }

  /** Evaluate `checks` against `df`; returns one report row per check:
    * `(check_name, target_col, violations, pass)`. */
  def validate(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "validate: empty expectation suite")
    val spark = df.sparkSession

    // every row-local check becomes one conditional-sum column of a
    // single aggregate over one shared scan
    val rowLocal = checks.collect {
      case c @ NotNull(col0) =>
        (c, sum(when(col(col0).isNull, 1L).otherwise(0L)))
      case c @ InRange(col0, lo, hi) =>
        (c, sum(when(col(col0).isNotNull &&
          (col(col0) < lit(lo) || col(col0) > lit(hi)), 1L).otherwise(0L)))
      case c @ InSet(col0, vs) =>
        (c, sum(when(col(col0).isNotNull &&
          !col(col0).isin(vs.map(lit): _*), 1L).otherwise(0L)))
      case c @ MatchesRegex(col0, p) =>
        (c, sum(when(col(col0).isNotNull &&
          !col(col0).rlike(p), 1L).otherwise(0L)))
    }
    // one aggregate row holding every row-local count, EXPLODED into
    // report rows — a per-check select-then-union would let column
    // pruning specialize each branch and re-scan the table per check
    val rowLocalReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.map { case ((_, a), i) =>
          coalesce(a, lit(0L)).as(s"__v$i")
        }
        Some(df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rowLocal.zipWithIndex.map { case ((c, _), i) =>
            struct(lit(c.checkName).as("check_name"),
              lit(c.targetCol).as("target_col"),
              col(s"__v$i").as("violations"))
          }: _*)).as("__r"))
          .select(col("__r.check_name"), col("__r.target_col"),
            col("__r.violations")))
      }

    val keyReports = checks.collect { case c @ Unique(cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - lit(1L)), lit(0L)).as("violations"))
        .select(lit(c.checkName).as("check_name"),
          lit(c.targetCol).as("target_col"), col("violations"))
    }

    val refReports = checks.collect { case c @ RefIntegrity(col0, ref, refCol) =>
      // distinct FK values → anti-join → weight by per-value row count:
      // the fact table shuffles (value, count), never rows
      df.filter(col(col0).isNotNull)
        .groupBy(col(col0).as("__fk")).agg(count(lit(1)).as("__n"))
        .join(ref.select(col(refCol).as("__fk")).distinct(),
          Seq("__fk"), "left_anti")
        .agg(coalesce(sum(col("__n")), lit(0L)).as("violations"))
        .select(lit(c.checkName).as("check_name"),
          lit(c.targetCol).as("target_col"), col("violations"))
    }

    (rowLocalReport.toSeq ++ keyReports ++ refReports)
      .reduce(_.unionAll(_))
      .withColumn("pass", col("violations") === lit(0L))
  }
}
