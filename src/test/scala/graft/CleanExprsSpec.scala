package graft

import graft.functions.CleanExprs
import org.apache.spark.sql.functions._

/** P5-P11 cleanup expressions with adversarial inputs (SURVEY.md §5.2),
  * including Python-golden hash parity for the stable customer id. */
class CleanExprsSpec extends SparkSpec {
  import spark.implicits._

  test("P6 unit-suffixed numeric extraction") {
    val got = Seq("8.9523ft³", "78.2641lb", "5.2901ft3", "junk", "", null)
      .toDF("v").select(CleanExprs.numFromUnitStr($"v").as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(8.9523), Some(78.2641), Some(5.2901), None, None, None))
  }

  test("P7 state-code validation: trim+upper, 2-letter-only, preference order") {
    val got = Seq(
      ("  nj \t", "99"), ("new jersey", "CA"), (null, "tx"), ("N/A", null))
      .toDF("state", "houseNo")
      .select(CleanExprs.stateCode($"state", $"houseNo").as("s"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("NJ"), Some("CA"), Some("TX"), None))
  }

  test("P5 timestamp parse: format-first, fallback, null on junk") {
    val got = Seq("2024-03-05 10:20:30", "2024-03-05 10:20:30\t", "2024-03-05", "garbage", null)
      .toDF("t").select(CleanExprs.parseTs($"t").cast("string").as("p"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("2024-03-05 10:20:30"))
    assert(got(1).contains("2024-03-05 10:20:30")) // trailing tab scrubbed
    assert(got(2).contains("2024-03-05 00:00:00")) // inference fallback
    assert(got(3).isEmpty && got(4).isEmpty)
  }

  test("P5 contract: signed extended-year forms are excluded by the digit gate") {
    // documented exclusion (see parseTs scaladoc): '+10000-01-01' NULLs
    // rather than parsing — cross-engine year-10k behavior diverges
    val got = Seq("+10000-01-01", "-0500-01-01").toDF("t")
      .select(CleanExprs.parseTs($"t").cast("string").as("p"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.forall(_.isEmpty))
  }

  test("P8 numeric coerce with default") {
    val got = Seq("3", "3.7", "x", null).toDF("g")
      .select(CleanExprs.intWithDefault($"g", 1).as("n"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3, 3, 1, 1)) // 3.7 truncates like astype(int)
  }

  test("P9 stable id matches Python md5 goldens (63-bit mask, utf-8)") {
    val got = Seq(
      ("John Smith", "1 Main St", "07001"),
      ("张三", "北京路1号", "100000"))
      .toDF("n", "a", "p")
      .select(CleanExprs.stableId($"n", $"a", $"p").as("id"))
      .collect().map(_.getLong(0))
    assert(got(0) == 7951322489277580467L)
    assert(got(1) == 2875976616132334899L)
  }

  test("P9 null stringification: 'None' for injected columns, 'nan' for cells") {
    val noneAll = Seq(("x", "y")).toDF("a", "b")
      .select(CleanExprs.stableIdWithNulls(Seq(
        lit(null).cast("string") -> "None",
        lit(null).cast("string") -> "None",
        lit(null).cast("string") -> "None")).as("id"))
      .collect().head.getLong(0)
    assert(noneAll == 2690087546563234085L) // python sid(None,None,None)
    val nanName = Seq(("x", "y")).toDF("a", "b")
      .select(CleanExprs.stableIdWithNulls(Seq(
        lit(null).cast("string") -> "nan", lit("x") -> "nan", lit("y") -> "nan")).as("id"))
      .collect().head.getLong(0)
    assert(nanName == 7414495173608960009L) // python sid(nan,'x','y')
  }

  test("P10 first-non-blank key coalesce") {
    val got = Seq(("  ", "SKU2"), ("SKU1", "SKU2"), ("", ""), (null, null))
      .toDF("m", "s")
      .select(CleanExprs.firstNonBlank($"m", $"s").as("k"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("SKU2"), Some("SKU1"), None, None))
  }

  test("S9 varchar truncation preserves NULL") {
    val got = Seq("abcdefghij", null).toDF("v")
      .select(CleanExprs.truncateTo($"v", 4).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("abcd"), None))
  }
}
