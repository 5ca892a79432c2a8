package graft

import org.apache.spark.sql.functions._

/** Dev one-off (not library surface, like [[ScaleUp]]): measure
  * q159's IVFADC composition at a REALISTIC nProbe vs the gate's
  * all-cells oracle trick, on a given corpus — pins the claimed
  * probed-cells/cells candidate shrink with a number (SCALE.md
  * round-13, r12 verdict #8). */
object PqProbeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf1.0")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val pqCb: Array[Array[Array[Double]]] = Array.tabulate(8, 16, 8) {
      (j, c, d) => (((j * 31 + c * 17 + d * 7) % 41) - 20) / 32.0
    }
    val pq = graft.operators.PqIndex.Model(pqCb)
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[pqprobe] corpus rows=${emb.count()}")
    val ivf = graft.operators.IvfIndex.train(emb, "vec_id", "embedding", k = 16)
    val codes = graft.operators.PqIndex.encode(emb, "vec_id", "embedding", pq)
      .localCheckpoint()
    val cells = graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", ivf)
      .select(col("n_id"), col("cell")).localCheckpoint()
    val queries = emb.where(col("vec_id") < 10).localCheckpoint()
    // candidate volume per nProbe: rows entering the ADC scoring join
    def candidates(nProbe: Int): Long = {
      import graft.functions.VectorNative
      val probes = queries.select(col("vec_id").as("q_id"),
        explode(VectorNative.nearestCells(col("embedding"),
          ivf.centroids.toSeq, nProbe)).as("cell"))
      cells.join(probes, Seq("cell")).count()
    }
    def timed(tag: String, nProbe: Int): Unit = {
      // one warm pass, then 3 timed
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.PqIndex.searchInCells(codes, cells, queries,
            "vec_id", "embedding", ivf, pq, kTop = 5, nProbe = nProbe)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 3).map(_ => once()).sorted
      println(f"[pqprobe] $tag nProbe=$nProbe median=${ts(1)}%.3f s " +
        f"passes=${ts.map(t => f"$t%.3f").mkString(",")} " +
        s"candidates=${candidates(nProbe)}")
    }
    timed("all-cells", 16)
    timed("realistic", 4)
    spark.stop()
  }
}
