package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev one-off: A/B the two k-core peel formulations INTERLEAVED in one
  * JVM (the LpaAb protocol — separate-session medians move ±15% on
  * ambient host state): (a) the r14 shape — per-round alive-semi-joins
  * that re-shuffle the edge list twice per round; (b) the r15 shape in
  * the library — edges hash-partitioned on u once at entry, per-round
  * DEAD-set broadcast anti-joins that filter the edge frame in place.
  * Same synthetic graph, same k/rounds as GraphScale's gate,
  * alternating A/B/A/B so host drift hits both arms equally. Both arms
  * include canonicalization so the one-time entry repartition is paid
  * inside the timed window (the honest end-to-end comparison). */
object PeelAb {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val mults = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)
    val dsts = mults.zipWithIndex.map { case (a, j) =>
      ((col("id") * a + j * 7 + 1) % n).cast("string")
    }
    val raw = spark.range(n)
      .select(col("id").cast("string").as("src"),
        explode(array(dsts: _*)).as("dst"))
      .localCheckpoint()
    println(s"[peelab] n=$n raw=${raw.count()} k=$k rounds=$rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    def oldStyle(): Long = {
      var e = raw
        .select(col("src").as("u"), col("dst").as("v"))
        .where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct().localCheckpoint()
      for (_ <- 1 to rounds) {
        val alive = degrees(e).where(col("degree") >= k).select(col("node"))
        e = e.join(alive.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(alive.select(col("node").as("v")), Seq("v"), "left_semi")
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      degrees(e).count()
    }
    def newStyle(): Long =
      graft.operators.LinkGraph.kCorePeel(raw, "src", "dst", k, rounds)
        .count()
    val w1 = oldStyle(); val w2 = newStyle() // warm both, cross-check
    require(w1 == w2, s"old=$w1 new=$w2 — formulations disagree")
    val (as, bs) = (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime(); oldStyle()
      val a = (System.nanoTime() - t0) / 1e9
      System.gc()
      val t1 = System.nanoTime(); newStyle()
      val b = (System.nanoTime() - t1) / 1e9
      (a, b)
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(1)
    println(f"[peelab] old median=${med(as)}%.3f s " +
      s"passes=${as.map(t => f"$t%.3f").mkString(",")}")
    println(f"[peelab] new median=${med(bs)}%.3f s " +
      s"passes=${bs.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
