package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev harness: per-batch duration breakdown of a streaming drain (the
  * round-18 streaming-floor adjudication). A listener prints each
  * micro-batch's durationMs map from the engine's own progress events,
  * so the trigger floor is attributed (planning vs state commit vs
  * addBatch) instead of guessed. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[probe] batch ${p.batchId} rows=${p.numInputRows} " +
          s"durations=${dur}")
        p.stateOperators.foreach(so =>
          println(s"[probe]   state op=${so.operatorName} " +
            s"commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs} " +
            s"rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}"))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val names = if (args.isEmpty) Array("q164_streaming_frontier_eviction") else args
    names.foreach { name =>
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name pass $pass total ${dt}%.2f s")
      }
    }
    spark.stop()
  }
}
