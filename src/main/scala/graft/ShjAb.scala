package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev one-off ([[PrAb]]'s pattern): A/B the per-round join strategy of
  * the iterative graph loops, interleaved in one JVM — (a) the r17
  * shape, stat-less per-round joins planned as SortMergeJoin (the big,
  * static, pre-partitioned edge frame is re-SORTED every round); (b)
  * the r18 shape, `shuffle_hash` hint on the node-sized side (edges
  * stream unsorted, only the per-partition rank map is built). Guide
  * §3.1: shuffled-hash beats sort-merge when one side is moderately
  * small per partition — here the small side is |nodes|/partitions,
  * which AQE-sized partitions bound at any scale. */
object ShjAb {
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
    val ed = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")),
        Seq("src"))
      .repartition(col("src"))
      .localCheckpoint()
    println(s"[shjab] n=$n edges=${e.count()}")
    def loop(hinted: Boolean): Long = {
      def h(df: DataFrame): DataFrame =
        if (hinted) df.hint("shuffle_hash") else df
      var rank = nodes.select(col("node"), lit(1000000L).as("__rm"))
      for (_ <- 1 to 3) {
        val contrib = ed
          .join(h(rank.select(col("node").as("src"), col("__rm"))),
            Seq("src"))
          .select(col("dst"), expr("__rm DIV __deg").as("__c"))
          .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
        rank = nodes
          .join(h(contrib.select(col("dst").as("node"), col("__s"))),
            Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(__s, 0L)) DIV 100"))
              .as("__rm"))
          .localCheckpoint()
      }
      rank.count()
    }
    // plan evidence for plans/r18: one round of each variant, formatted
    if (sys.env.contains("SHJAB_EXPLAIN")) {
      def round(hinted: Boolean): DataFrame = {
        def h(df: DataFrame): DataFrame =
          if (hinted) df.hint("shuffle_hash") else df
        val rank = nodes.select(col("node"), lit(1000000L).as("__rm"))
        val contrib = ed
          .join(h(rank.select(col("node").as("src"), col("__rm"))),
            Seq("src"))
          .select(col("dst"), expr("__rm DIV __deg").as("__c"))
          .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
        nodes.join(h(contrib.select(col("dst").as("node"), col("__s"))),
          Seq("node"), "left")
      }
      println("[shjab] ===== one propagation round, UNHINTED (r17) =====")
      round(hinted = false).explain("formatted")
      println("[shjab] ===== one propagation round, shuffle_hash (r18) =====")
      round(hinted = true).explain("formatted")
      spark.stop(); return
    }
    loop(false); loop(true) // warm
    val (as, bs) = (1 to 5).map { _ =>
      System.gc()
      val t0 = System.nanoTime(); loop(false)
      val a = (System.nanoTime() - t0) / 1e9
      System.gc()
      val t1 = System.nanoTime(); loop(true)
      val b = (System.nanoTime() - t1) / 1e9
      (a, b)
    }.unzip
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    println(f"[shjab] smj median=${med(as)}%.3f s " +
      s"passes=${as.map(t => f"$t%.3f").mkString(",")}")
    println(f"[shjab] shj median=${med(bs)}%.3f s " +
      s"passes=${bs.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
