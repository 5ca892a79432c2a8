package graft

import org.apache.spark.sql.functions._

/** Dev one-off ([[PqProbeScale]]'s pattern): measure SemDeDup's
  * cluster confinement — the q166 gate deliberately runs ONE cell (the
  * oracle identity point, also the quadratic worst case); this pins
  * what a trained multi-cell model buys on the same corpus
  * (SCALE.md round-13). */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf1.0")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    println(s"[semdedup] corpus rows=${emb.count()}")
    val e0 = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    val one = graft.operators.IvfIndex.Model(Array(e0))
    val many = graft.operators.IvfIndex.train(emb, "vec_id", "embedding",
      k = 16)
    def pairBound(m: graft.operators.IvfIndex.Model): Long = {
      import graft.functions.VectorNative
      val cents = m.centroids.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
      }.toSeq
      val nv = VectorNative.l2Normalize(col("embedding").cast("array<double>"))
      emb.select(VectorNative.nearestCentroid(nv, cents).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1)")).cast("long")).collect()(0).getLong(0)
    }
    // the one-cell worst case exceeds DefaultMaxCellPairs at sf1.0 by
    // design (that's what the guard refuses); this measure raises the
    // bound DELIBERATELY — the documented override contract. The
    // trained-16 run rides the default, demonstrating it passes.
    def run(tag: String, m: graft.operators.IvfIndex.Model,
            maxPairs: Long): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = graft.operators.SemDeDup.dedup(emb, "vec_id", "embedding",
          m, tau = 0.35, maxCellPairs = maxPairs).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once()
      val rs = (1 to 3).map(_ => once())
      val ts = rs.map(_._1).sorted
      println(f"[semdedup] $tag cells=${m.centroids.length} " +
        f"median=${ts(1)}%.3f s passes=${ts.map(t => f"$t%.3f").mkString(",")} " +
        s"survivors=${rs.head._2} pairBound=${pairBound(m)}")
    }
    run("one-cell (q166 worst case)", one, Long.MaxValue)
    run("trained-16", many, graft.operators.SemDeDup.DefaultMaxCellPairs)
    spark.stop()
  }
}
