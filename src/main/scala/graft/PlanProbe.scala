package graft

/** Dev harness: print the AQE-FINAL executed plan of a query (after one
  * execution) — the initial `explain` cannot show runtime exchange/stage
  * reuse, which is exactly what decides whether e.g. jaccardPairs' two
  * size-aggregate subtrees run once or twice (r18 audit). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.foreach(_ => ()) // finalize AQE on THIS QueryExecution
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      println(s"\n========== $name (AQE-final) ==========")
      println(p.toString)
    }
    spark.stop()
  }
}
