package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev one-off ([[LpaAb]]'s pattern): A/B the two pageRank per-round
  * formulations interleaved in one JVM — (a) the r13 shape, joining
  * the rank frame AND the out-degree table per iteration; (b) the r14
  * shape, degree folded into the edge frame once before the loop
  * (degrees never change, so re-joining them each round is rework). */
object PrAb {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val mults = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)
    val dsts = mults.zipWithIndex.map { case (a, j) =>
      ((col("id") * a + j * 7 + 1) % n).cast("string")
    }
    val e = spark.range(n)
      .select(col("id").cast("string").as("src"),
        explode(array(dsts: _*)).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    val ed = e.join(outdeg, Seq("src")).repartition(col("src"))
      .localCheckpoint()
    println(s"[prab] n=$n edges=${e.count()}")
    def step(contrib: DataFrame, rank: DataFrame): DataFrame = nodes
      .join(contrib.select(col("dst").as("node"), col("__s")),
        Seq("node"), "left")
      .select(col("node"),
        (lit(150000L) + expr("(85 * coalesce(__s, 0L)) DIV 100"))
          .as("__rm"))
      .localCheckpoint()
    def oldStyle(): Long = {
      var rank = nodes.select(col("node"), lit(1000000L).as("__rm"))
      for (_ <- 1 to 3) {
        val contrib = e
          .join(rank.select(col("node").as("src"), col("__rm")), Seq("src"))
          .join(outdeg, Seq("src"))
          .select(col("dst"), expr("__rm DIV __deg").as("__c"))
          .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
        rank = step(contrib, rank)
      }
      rank.count()
    }
    def newStyle(): Long = {
      var rank = nodes.select(col("node"), lit(1000000L).as("__rm"))
      for (_ <- 1 to 3) {
        val contrib = ed
          .join(rank.select(col("node").as("src"), col("__rm")), Seq("src"))
          .select(col("dst"), expr("__rm DIV __deg").as("__c"))
          .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
        rank = step(contrib, rank)
      }
      rank.count()
    }
    oldStyle(); newStyle() // warm
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
    println(f"[prab] old median=${med(as)}%.3f s " +
      s"passes=${as.map(t => f"$t%.3f").mkString(",")}")
    println(f"[prab] new median=${med(bs)}%.3f s " +
      s"passes=${bs.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
