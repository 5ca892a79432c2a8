package graft

import graft.operators.Stats
import org.apache.spark.sql.functions.{col, lit}

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

  test("featureCorrelations: listwise deletion — a row with ANY null " +
    "feature is excluded from n and every moment") {
    import spark.implicits._
    val clean = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L))
      .toDF("x", "y")
    // same rows + two rows with a null in one column each: identical output
    val dirty = Seq(
      (Option(1L), Option(2L)), (Option(2L), Option(4L)),
      (Option(3L), Option(6L)), (Option(4L), Option(8L)),
      (Option(99L), Option.empty[Long]), (Option.empty[Long], Option(99L)))
      .toDF("x", "y")
    val a = Stats.featureCorrelations(clean, Seq("x", "y")).collect()(0)
    val b = Stats.featureCorrelations(dirty, Seq("x", "y")).collect()(0)
    assert(b.getLong(2) == 4L, s"n should count complete rows: $b")
    assert(a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3))
  }

  test("benfordAudit: empty / all-sub-1 input yields an empty frame with " +
    "the full schema, not an NPE on the null SUM") {
    import spark.implicits._
    val empty = Stats.benfordAudit(Seq.empty[Double].toDF("v"), "v")
    assert(empty.columns.toSeq ==
      Seq("digit", "n", "share", "expected", "chi_term"))
    assert(empty.count() == 0L)
    val sub1 = Stats.benfordAudit(Seq(0.3, 0.9, -5.0).toDF("v"), "v")
    assert(sub1.count() == 0L)
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

  test("benfordAudit: integer-domain first digits, pinned expectations, " +
    "exact chi terms; sub-1 values excluded") {
    import spark.implicits._
    val df = ((1 to 9).map(_.toDouble) ++ Seq(19.4, 0.5)).toDF("v")
    val out = Stats.benfordAudit(df, "v").orderBy("digit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.length == 9)
    assert(out.map(_._2).toSeq == Seq(2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    val d1 = out(0)
    assert(d1._3 == 0.2 && d1._4 == 0.301030)
    // chi term for digit 1: (2 - 3.0103)^2 / 3.0103, rounded half-up at 6
    val exp = new java.math.BigDecimal(
      (2.0 - 3.0103) * (2.0 - 3.0103) / 3.0103)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(d1._5 == exp, s"${d1._5} vs $exp")
  }

  test("contentFingerprint: order-independent, content-sensitive, " +
    "empty-safe") {
    import spark.implicits._
    val a = Seq("r1", "r2", "r3").toDF("c")
    val b = Seq("r3", "r1", "r2").toDF("c").repartition(5)
    def fp(df: org.apache.spark.sql.DataFrame) =
      Stats.contentFingerprint(df, col("c")).collect()(0)
    assert(fp(a).getLong(0) == 3L)
    assert(fp(a).getLong(1) == fp(b).getLong(1))   // order/layout invariant
    val c = Seq("r1", "r2", "rX").toDF("c")
    assert(fp(a).getLong(1) != fp(c).getLong(1))   // content sensitive
    val e = spark.emptyDataFrame.withColumn("c", lit("x")).where(lit(false))
    assert(fp(e).getLong(0) == 0L && fp(e).getLong(1) == 0L)
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
