package graft

import graft.sources.WarehouseStore
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join evidence: two tables bucketed on the same key join
  * without any shuffle exchange in the physical plan. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucket-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("bucketed tables join with zero exchanges") {
    import spark.implicits._
    val orders = (1L to 2000L).map(k => (k, s"o$k")).toDF("k", "o_payload")
    val lines = (1L to 6000L).map(i => (i % 2000 + 1, s"l$i")).toDF("k", "l_payload")
    WarehouseStore.saveBucketed(orders, "b_orders", Seq("k"), 8)
    WarehouseStore.saveBucketed(lines, "b_lines", Seq("k"), 8)
    val joined = spark.table("b_orders").join(spark.table("b_lines"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
    assert(joined.count() == 6000)
  }
}
