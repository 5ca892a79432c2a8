package graft

import org.apache.spark.sql.functions._

/** Approximate sketches stay within documented error of the exact
  * answers they substitute for at scale. */
class SketchSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.001")

  test("approx_count_distinct within 5% of exact per group") {
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type").agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      assert(math.abs(approx(k) - x).toDouble / x <= 0.05, s"$k: $x vs ${approx(k)}")
    }
  }

  test("percentile_approx within the 1/accuracy rank-error bound of exact") {
    val exact = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("x"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(1000)).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rank error 1/1000 -> compare against the p49.8/p50.2 exact band
    val band = ev.groupBy("event_type").agg(
        expr("percentile(value, 0.495)").as("lo"),
        expr("percentile(value, 0.505)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.keys.foreach { k =>
      val (lo, hi) = band(k)
      assert(approx(k) >= lo && approx(k) <= hi,
        s"$k: approx ${approx(k)} outside [$lo, $hi] (exact ${exact(k)})")
    }
  }
}
