package graft

import graft.plans.{GraftExtensions, TopK}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom TopKPerKey operator: result-equality with the window
  * formulation, rank semantics, and the partial/final physical shape. */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def scored = {
    import spark.implicits._
    // 40 keys x 250 rows with ties to exercise the tiebreaker
    spark.range(10000).select(
      (col("id") % 40).as("k"),
      (col("id") % 97).cast("double").as("score"),
      col("id").as("tie"))
  }

  test("equals window row_number formulation, including ties") {
    val custom = TopK.perKey(scored, Seq("k"),
      Seq(TopK.Sort("score", desc = true), TopK.Sort("tie")), k = 5)
      .select("k", "score", "tie", "rank")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("tie").asc)
    val win = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("k", "score", "tie", "rank")
      .collect().map(_.toSeq).toSet
    assert(custom == win)
    assert(custom.size == 40 * 5)
  }

  test("physical plan is partial+final TopKPerKeyExec around one exchange") {
    val plan = TopK.perKey(scored, Seq("k"), Seq(TopK.Sort("score", desc = true)), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert("TopKPerKey".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("k larger than group size returns whole groups ranked") {
    import spark.implicits._
    val tiny = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("k", "score")
    val got = TopK.perKey(tiny, Seq("k"), Seq(TopK.Sort("score", desc = true)), 10)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got == Set((1, 20.0, 1), (1, 10.0, 2), (2, 5.0, 1)))
  }
}
