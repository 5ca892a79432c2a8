package graft

import graft.operators.Expectations
import graft.operators.Expectations._

/** Data-expectations validator: per-check violation counts on a fixture
  * with known defects, SQL-parity null semantics, and the one-pass plan
  * shape for row-local checks. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // (id, fk, status, price, code)
    (1L, Option(10L), "OK", 5.0, "A-1"),
    (2L, Option(10L), "OK", 50.0, "B-2"),
    (2L, Option(20L), "BAD", -1.0, "zz"), // dup id, bad status/range/regex
    (3L, None, "OK", 9.0, "C-3"),         // null fk: legal for FK, not for NotNull
    (4L, Option(99L), "OK", 1e9, "D-4"))  // fk miss, over range
    .toDF("id", "fk", "status", "price", "code")

  private def refDim = Seq(10L, 20L).toDF("k")

  test("each check type counts violations with SQL null semantics") {
    val out = Expectations.validate(fixture, Seq(
      NotNull("fk"),
      InRange("price", 0.0, 100.0),
      InSet("status", Seq("OK")),
      MatchesRegex("code", "^[A-Z]-"),
      Unique(Seq("id")),
      RefIntegrity("fk", refDim, "k")))
    val rows = out.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows("not_null") == (1L, false))      // the None fk
    assert(rows("in_range") == (2L, false))      // -1.0 and 1e9
    assert(rows("in_set") == (1L, false))        // BAD
    assert(rows("matches_regex") == (1L, false)) // zz
    assert(rows("unique") == (1L, false))        // id=2 twice
    assert(rows("ref_integrity") == (1L, false)) // fk=99; null fk is legal
  }

  test("clean table passes every check") {
    val out = Expectations.validate(fixture.where($"id" === 1L), Seq(
      NotNull("fk"), InRange("price", 0.0, 100.0), Unique(Seq("id")),
      RefIntegrity("fk", refDim, "k")))
    assert(out.collect().forall(_.getBoolean(3)))
    assert(out.collect().forall(_.getLong(2) == 0L))
  }

  test("unique groups nulls as values, like GROUP BY") {
    val df = Seq(Option(1L), None, None).toDF("k")
    val out = Expectations.validate(df, Seq(Unique(Seq("k"))))
    assert(out.head().getLong(2) == 1L) // two null keys -> one extra row
  }

  test("row-local checks fuse into one pass: a single scan of the input") {
    val out = Expectations.validate(fixture, Seq(
      NotNull("fk"), InRange("price", 0.0, 100.0),
      InSet("status", Seq("OK")), MatchesRegex("code", "^[A-Z]-")))
    val plan = out.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, plan:\n${plan.take(1200)}")
  }

  test("empty suite fails loudly") {
    intercept[IllegalArgumentException] {
      Expectations.validate(fixture, Seq.empty)
    }
  }

  test("degenerate check definitions fail at construction, not at count time") {
    intercept[IllegalArgumentException] { InRange("price", 10.0, 1.0) }
    intercept[IllegalArgumentException] { InSet("status", Seq.empty) }
  }
}
