package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-wise cleanup expressions — the reference's pandas cleanup pass
  * re-expressed as pure `Column` functions (SURVEY.md §2.2 P5-P14).
  *
  * All of these are built-in Catalyst expressions (codegen'd, pushdown- and
  * prune-friendly); none are UDFs, so they stay inside whole-stage codegen
  * on the scan→project hot path at any scale.
  *
  * Reference cites (relative to /root/reference/):
  *  - timestamp parse w/ fallback: etl/order_info_etl.py:37-46
  *  - unit-suffix numeric extraction: etl/order_info_etl.py:48-50
  *  - state-code validation: etl/order_info_etl.py:52-54
  *  - stable customer hash id: etl/order_info_etl.py:56-65
  *  - product-key coalesce: etl/order_info_etl.py:234-242
  *  - numeric coerce w/ default: etl/order_info_etl.py:218-221
  *  - varchar-length truncation: etl/order_info_etl.py:331-348
  */
object CleanExprs {

  /** P5: trim whitespace incl. tabs, parse `yyyy-MM-dd HH:mm:ss`, fall back
    * to Spark's default timestamp inference, NULL on failure (mirrors
    * pandas `errors="coerce"`). Character-set trim, not regexp_replace —
    * regex trims cost ~µs/row, a real tax on a 100 TB keying pass.
    *
    * The lenient formatter fallbacks only run when the string starts with
    * a digit: every format they can parse does (ISO-ish), and without the
    * guard each non-date string pays TWO exception-driven formatter
    * attempts — measured ~2s of the sf0.1 ETL on the synthetic frame's
    * garbage rows alone.
    *
    * Deliberate exclusion (CleanExprsSpec pins it): signed extended-year
    * forms ('+10000-01-01') fail the digit gate and return NULL even
    * though Spark's bare inference could parse them — engines disagree on
    * years beyond 9999 (the DuckDB oracle rejects them), and the
    * reference's pandas coercion never sees them; a sales feed containing
    * year-10k timestamps is garbage by definition here. */
  def parseTs(c: Column): Column = {
    val t = trim(c, " \t\r\n")
    coalesce(StrictTs.strictTs(t),
      when(substring(t, 1, 1).between("0", "9"),
        coalesce(try_to_timestamp(t, lit("yyyy-MM-dd HH:mm:ss")),
          try_to_timestamp(t))))
  }

  /** P6: `"8.9523ft³"` / `"78.2641lb"` → 8.9523d; first decimal-number match,
    * NULL when no digits. */
  def numFromUnitStr(c: Column): Column =
    nullif(regexp_extract(c, "([0-9]+(?:\\.[0-9]+)?)", 1), lit("")).cast(DoubleType)

  /** P7: trim+upper; keep iff `^[A-Z]{2}$`, else NULL. `sources` are tried
    * in preference order (reference: `State` then `houseNo`). The [A-Z]
    * test is spelled as length + per-char range checks — equivalent to the
    * anchored regex (length() counts chars, and after upper() only
    * characters above 'Z' or below 'A' can fail), without paying a regex
    * matcher per row on the keying pass. */
  def stateCode(sources: Column*): Column = {
    val validated = sources.map { c =>
      val u = upper(scrub(c)) // pandas .str.strip() removes tabs/CR too
      when(length(u) === 2 &&
        substring(u, 1, 1).between("A", "Z") &&
        substring(u, 2, 1).between("A", "Z"), u)
    }
    coalesce(validated: _*)
  }

  /** P8: numeric coerce with default (invalid/missing → `default`).
    * try_cast because Spark 4 runs ANSI mode by default — a plain cast
    * would fail the job on the first malformed cell instead of defaulting,
    * the opposite of `errors="coerce"`. */
  def intWithDefault(c: Column, default: Int): Column =
    coalesce(c.try_cast(DoubleType).cast(IntegerType), lit(default))

  /** P9: deterministic 63-bit surrogate key:
    * `int(md5(f"{a}|{b}|…")[:16], 16) & (2^63 - 1)`.
    * NULL inputs stringify as `"None"` exactly like the Python f-string
    * (hash parity with the reference). Masking the top bit of the unsigned
    * 64-bit value == `mod 2^63`, done in decimal space because Spark has no
    * unsigned long. Pure built-ins ⇒ codegen'd.
    */
  def stableId(parts: Column*): Column =
    stableIdWithNulls(parts.map(p => p -> "None"))

  /** As [[stableId]] but with a per-part null literal: pandas stringifies a
    * missing CSV cell as "nan" (NaN) but an injected all-NULL column as
    * "None" — reproducing both is required for hash parity with the
    * reference on its own inputs (etl/order_info_etl.py:223-232). */
  def stableIdWithNulls(parts: Seq[(Column, String)]): Column = {
    val key = concat_ws("|",
      parts.map { case (p, nul) => coalesce(p.cast(StringType), lit(nul)) }: _*)
    hex16ToId(md5(key))
  }

  /** First 16 hex chars of a 32-char hex digest → unsigned int → mod 2^63. */
  private[graft] def hex16ToId(hexDigest: Column): Column =
    (conv(substring(hexDigest, 1, 16), 16, 10).cast(DecimalType(20, 0))
      % lit(new java.math.BigDecimal("9223372036854775808"))).cast(LongType)

  /** P10: first non-blank of the candidate keys, blank → NULL. */
  def firstNonBlank(cs: Column*): Column =
    coalesce(cs.map(c => nullif(trim(c), lit(""))): _*)

  /** P11: scrub leading/trailing whitespace (incl. tabs/CR/LF) — pandas
    * str.strip() semantics via character-set trim (no regex). */
  def scrub(c: Column): Column =
    trim(c, " \t\r\n")

  /** S9: varchar(n) truncation pre-write, mirroring the DDL length map. */
  def truncateTo(c: Column, n: Int): Column =
    when(c.isNotNull, substring(c, 1, n))
}
