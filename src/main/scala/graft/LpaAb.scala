package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev one-off: A/B the two LPA per-round formulations INTERLEAVED in
  * one JVM (separate-session medians moved ±15% on ambient host state,
  * which is bigger than the effect): (a) the r13 shape — per-node max
  * count, join back, min(label); (b) the r14 shape — one
  * `min(struct(−count, label))` argmax-min aggregate, no join, no
  * multi-consumer checkpoint. Same adjacency, same rounds, alternating
  * A/B/A/B so host drift hits both arms equally. */
object LpaAb {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val mults = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)
    val dsts = mults.zipWithIndex.map { case (a, j) =>
      ((col("id") * a + j * 7 + 1) % n).cast("string")
    }
    val e = spark.range(n)
      .select(col("id").cast("string").as("u"),
        explode(array(dsts: _*)).as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()
    val adj = e.select(col("u").as("nbr"), col("v").as("node"))
      .unionAll(e.select(col("v").as("nbr"), col("u").as("node")))
      .repartition(col("nbr"))
      .localCheckpoint()
    val nodes = adj.select(col("node")).distinct().localCheckpoint()
    println(s"[lpaab] n=$n adj=${adj.count()}")
    def round(lab: DataFrame): DataFrame = adj
      .join(lab.select(col("node").as("nbr"), col("label")), Seq("nbr"))
      .select(col("node"), col("label"))
      .groupBy(col("node"), col("label"))
      .agg(count(lit(1)).as("__c"))
    def oldStyle(): Long = {
      var lab = nodes.select(col("node"), col("node").as("label"))
      for (_ <- 1 to 2) {
        val votes = round(lab).localCheckpoint()
        val best = votes.groupBy(col("node")).agg(max(col("__c")).as("__m"))
        lab = votes.join(best, Seq("node"))
          .where(col("__c") === col("__m"))
          .groupBy(col("node")).agg(min(col("label")).as("label"))
          .localCheckpoint()
      }
      lab.count()
    }
    def newStyle(): Long = {
      var lab = nodes.select(col("node"), col("node").as("label"))
      for (_ <- 1 to 2) {
        lab = round(lab)
          .groupBy(col("node"))
          .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
            .as("__b"))
          .select(col("node"), col("__b").getField("l").as("label"))
          .localCheckpoint()
      }
      lab.count()
    }
    oldStyle(); newStyle() // warm both
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
    println(f"[lpaab] old median=${med(as)}%.3f s " +
      s"passes=${as.map(t => f"$t%.3f").mkString(",")}")
    println(f"[lpaab] new median=${med(bs)}%.3f s " +
      s"passes=${bs.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
