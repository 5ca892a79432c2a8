package graft

/** Dev one-off: exact [[graft.operators.TrainingData.vocabGrowth]] vs
  * the sketched [[graft.operators.TrainingData.vocabGrowthApprox]] at a
  * given corpus — the SCALE.md evidence that the sketch path's shuffle
  * stops scaling with distinct-gram mass (the exact path's min-agg
  * carries one row per distinct gram; q201 measured 4.1× rows for 10×
  * data because ScaleUp's replica tokens mint new grams).
  *
  * Usage: runMain graft.VocabScale [sfDir] (default sf0.1). */
object VocabScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    println(s"[vocabscale] $sfDir docs=${docs.count()}")
    def medianOf3(tag: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[vocabscale] $tag median=${ts(1)}%.3f s " +
        s"passes=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    medianOf3("vocabGrowth exact (bigrams)") {
      force(graft.operators.TrainingData.vocabGrowth(
        docs, "doc_id", "text", batchSize = 25L, n = 2))
    }
    medianOf3("vocabGrowthApprox hll (bigrams)") {
      force(graft.operators.TrainingData.vocabGrowthApprox(
        docs, "doc_id", "text", batchSize = 25L, n = 2))
    }
    spark.stop()
  }
}
