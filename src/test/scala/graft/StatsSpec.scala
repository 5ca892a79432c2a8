package graft

import graft.operators.Stats

/** Exact-moment Pearson correlations: known values, zero-variance null,
  * quantization, partitioning invariance. */
class StatsSpec extends SparkSpec {

  test("featureCorrelations: perfect, inverse, and known mid correlations") {
    import spark.implicits._
    // y = 2x -> corr 1; z = -x -> corr -1 with both
    val df = Seq((1L, 2L, -1L), (2L, 4L, -2L), (3L, 6L, -3L), (4L, 8L, -4L))
      .toDF("x", "y", "z")
    val out = Stats.featureCorrelations(df, Seq("x", "y", "z"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("x", "y")) == (4L, 1.0))
    assert(out(("x", "z")) == (4L, -1.0))
    assert(out(("y", "z")) == (4L, -1.0))
    // a known non-unit case: x=1..4, w=(1,3,2,4): corr = 0.8
    val df2 = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "w")
    val c = Stats.featureCorrelations(df2, Seq("x", "w"))
      .collect()(0).getDouble(3)
    assert(c == 0.8, c.toString)
  }

  test("featureCorrelations: zero variance yields null, not NaN") {
    import spark.implicits._
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "konst")
    val r = Stats.featureCorrelations(df, Seq("x", "konst")).collect()(0)
    assert(r.isNullAt(3))
  }

  test("featureCorrelations: scale quantizes identically regardless of " +
    "partitioning") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i * 0.13, 100.0 - i * 0.4 + (i % 7)))
    val a = Stats.featureCorrelations(rows.toDF("u", "v"), Seq("u", "v"),
      scale = 3).collect()(0).getDouble(3)
    val b = Stats.featureCorrelations(
      rows.toDF("u", "v").repartition(13), Seq("u", "v"), scale = 3)
      .collect()(0).getDouble(3)
    assert(a == b, s"$a vs $b")
    assert(a < -0.9 && a > -1.0, a.toString)
  }

  test("bounds reject") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Stats.featureCorrelations(df, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Stats.featureCorrelations(df, Seq("x", "x"))
    }
    intercept[IllegalArgumentException] {
      Stats.featureCorrelations(df, Seq("x", "y"), scale = 12)
    }
  }
}
