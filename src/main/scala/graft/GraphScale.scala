package graft

import org.apache.spark.sql.functions._

/** Dev one-off ([[SemDedupScale]]'s pattern; round-13 verdict missing
  * #3): every LinkGraph GATE rides the fixed 97-node host graph, so
  * SCALE.md's earlier ~1x ratios measured the document scan feeding the
  * edge dedup, not the iteration machinery. This mints a synthetic
  * graph whose NODE and EDGE counts genuinely scale — N nodes,
  * out-degree 8, dst_j = (src·a_j + b_j) mod N with fixed odd
  * multipliers (a functional graph: deterministic, no RNG, degree
  * structure invariant in N) — and times the four iterative operators
  * at 1x and 10x so the per-round join/aggregate shapes are pinned by
  * measurement, like every other family in SCALE.md.
  *
  * Usage: runMain graft.GraphScale [baseNodes] [opFilter] (default
  * 100000, all operators; opFilter is a comma-separated substring
  * match, e.g. "kCore" re-measures one row without paying the rest). */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val base = args.lift(0).map(_.toLong).getOrElse(100000L)
    val opFilter = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val mults = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)
    def edges(n: Long) = {
      val dsts = mults.zipWithIndex.map { case (a, j) =>
        ((col("id") * a + j * 7 + 1) % n).cast("string")
      }
      spark.range(n)
        .select(col("id").cast("string").as("src"),
          explode(array(dsts: _*)).as("dst"))
        .localCheckpoint()
    }
    def medianOf3(tag: String, n: Long)(body: => Unit): Unit = {
      if (!opFilter.forall(_.exists(tag.contains))) return
      body // warm (JIT/codegen)
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[graphscale] n=$n $tag median=${ts(1)}%.3f s " +
        s"passes=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (n <- Seq(base, base * 10)) {
      val e = edges(n)
      println(s"[graphscale] n=$n edges=${e.count()}")
      medianOf3("pageRank(3)", n) {
        force(graft.operators.LinkGraph.pageRank(e, "src", "dst", iters = 3))
      }
      medianOf3("labelPropagation(2)", n) {
        force(graft.operators.LinkGraph.labelPropagation(e, "src", "dst",
          iters = 2))
      }
      medianOf3("kCorePeel(16,3)", n) {
        force(graft.operators.LinkGraph.kCorePeel(e, "src", "dst",
          k = 16, rounds = 3))
      }
      medianOf3("triangles", n) {
        force(graft.operators.LinkGraph.triangles(e, "src", "dst"))
      }
    }
    spark.stop()
  }
}
