package graft

import graft.functions.CleanExprs
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extensions: SQL function injection + the NativeHashRewrite optimizer
  * rule collapsing composed md5-key algebra into StableId63. */
class ExtensionsSpec extends AnyFunSuite {
  // dedicated session: extensions install at session creation, so clear
  // any default session another suite created (the SparkContext is reused)
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("injected SQL functions resolve") {
    val r = spark.sql(
      """SELECT stable_id63('John Smith|1 Main St|07001') AS id,
                size(shingle_hash32('a b c d', 3)) AS n3,
                size(shingle_hash32('a b c d')) AS nd""").collect().head
    assert(r.getLong(0) == 7951322489277580467L)
    assert(r.getInt(1) == 2 && r.getInt(2) == 2)
  }

  test("optimizer rewrites composed stableId into the native expression") {
    // non-literal input so constant folding can't collapse the plan first
    val df = spark.range(3)
      .select(CleanExprs.stableId(col("id").cast("string")).as("id"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("stable_id63"),
      s"expected native rewrite in plan:\n$optimized")
    // and the rewritten plan computes the same values as the composed form
    import spark.implicits._
    val composed = Seq("0", "1", "2").toDF("k")
      .select(graft.functions.StableId63.stableId63(col("k")).as("id"))
      .as[Long].collect().toSet
    assert(df.as[Long].collect().toSet == composed)
  }
}
