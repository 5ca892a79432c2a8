package graft

import org.apache.spark.sql.functions._

object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("8")
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100).selectExpr("id + 1 AS x")
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println("[p2] trivial plan:\n" + p.toString)
    println("[p2] conf wholeStage = " + spark.conf.get("spark.sql.codegen.wholeStage"))
    println("[p2] conf maxFields = " + spark.conf.get("spark.sql.codegen.maxFields"))
    val synth = graft.etl.ReferenceShapedData.syntheticOrders(spark, "/root/testdata/sf0.001")
    val one = synth.select("orderNo")
    one.collect()
    val p2 = one.queryExecution.executedPlan
    println("[p2] synth orderNo executedPlan:\n" + p2.toString.take(1500))
    spark.stop()
  }
}
