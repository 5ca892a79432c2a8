package graft

import graft.operators.SkewReport

/** Key-skew diagnosis: exact counts/ratios, null-key handling, top-N
  * plan shape. */
class SkewReportSpec extends SparkSpec {

  test("keySkew: counts, share, skew multiplier, null key counted as ∅") {
    import spark.implicits._
    // 10 rows: "hot" x6, "a" x2, "b" x1, null x1 -> 4 keys, mean 2.5
    val df = (Seq.fill(6)(Some("hot")) ++ Seq.fill(2)(Some("a")) ++
      Seq(Some("b"), None)).toDF("k")
    val out = SkewReport.keySkew(df, "k", topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("hot", 6L, 0.6, 2.4, 10L, 4L),
      ("a", 2L, 0.2, 0.8, 10L, 4L),
      // tie between "b" and "∅" at cnt=1 -> key order; "b" < "∅"
      ("b", 1L, 0.1, 0.4, 10L, 4L)), out.mkString("\n"))
  }

  test("keySkew: topN past the key count returns every key; bounds reject") {
    import spark.implicits._
    val df = Seq("x", "x", "y").toDF("k")
    assert(SkewReport.keySkew(df, "k", 100).count() == 2L)
    intercept[IllegalArgumentException] {
      SkewReport.keySkew(df, "k", 0)
    }
  }

  test("plan: top-N is TakeOrderedAndProject, never a full global sort") {
    import spark.implicits._
    // the fixture must be LARGER than topN: when the optimizer can prove
    // maxRows <= topN (tiny local relations) it eliminates the limit
    // entirely and plans a plain Sort — correct, but not the shape under
    // test
    val df = (1 to 50).map(i => s"k${i % 17}").toDF("k")
    val plan = SkewReport.keySkew(df, "k", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
