package graft


/** Dev one-off ([[IvfQ236Ab]]'s interleaved pattern): adjudicate the
  * round-16 q56 driver-bench uptick (2.66 → 3.38 s against a 0.78×
  * round). Code audit first: `git diff ea7da84..e547e8f` touches
  * Dedup.scala ONLY in the store verbs (lines 266–855 — staging,
  * re-bucket); q56's timed path (jaccardPairs at :90, components at
  * :1351) is byte-identical between the rounds, so the only open
  * question is the isolated quiet-host number. This harness times the
  * two halves separately over interleaved rounds so a real regression
  * would also LOCALIZE (candidate generation vs propagation).
  *
  * Usage: runMain graft.DedupQ56Ab [sfDir] [rounds]. */
object DedupQ56Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    println(s"[q56ab] $sfDir docs=${docs.count()}")
    def timed(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[q56ab] $tag $dt%.3f s")
      dt
    }
    // warm once (JIT/codegen outside the measurement)
    graft.operators.Dedup.components(docs, "doc_id",
        graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.4,
          ngram = 3))
      .write.format("noop").mode("overwrite").save()
    val pairsT = Array.fill(rounds)(0.0)
    val compT = Array.fill(rounds)(0.0)
    (0 until rounds).foreach { r =>
      var pairs: org.apache.spark.sql.DataFrame = null
      pairsT(r) = timed(s"jaccardPairs r$r") {
        pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
          0.4, ngram = 3).localCheckpoint()
      }
      compT(r) = timed(s"components r$r") {
        graft.operators.Dedup.components(docs, "doc_id", pairs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    def stats(tag: String, a: Array[Double]): Unit = {
      val s = a.sorted
      // true median: mean of the two middle elements for even counts
      val med = if (s.length % 2 == 1) s(s.length / 2)
                else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      println(f"[q56ab] $tag min=${a.min}%.3f median=$med%.3f max=${a.max}%.3f")
    }
    stats("jaccardPairs", pairsT)
    stats("components", compT)
    stats("q56 total", pairsT.zip(compT).map(t => t._1 + t._2))
    spark.stop()
  }
}
