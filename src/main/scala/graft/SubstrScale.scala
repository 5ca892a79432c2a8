package graft

import org.apache.spark.sql.functions._

/** Dev one-off ([[SemDedupScale]]'s pattern): wall-time the
  * token-window span family — corpus-wide exact-substring dedup and
  * surgical eval-span redaction — at a given corpus, so SCALE.md can
  * carry measured sf0.1 → sf1.0 ratios for the two operators whose
  * shuffle is corpus-token-sized (the widest shuffle class in the
  * text family; the ratio tells us whether the winner vote or the
  * text reassembly dominates as tokens grow 10x).
  *
  * Usage: runMain graft.SubstrScale [sfDir] [reps] (default sf0.1, 1).
  * `reps` > 1 replicates the documents in memory with [[ScaleUp]]'s
  * exact text transform (shifted ids; every 5th token tagged per
  * replica, so cross-replica L-grams break while within-replica span
  * structure replicates cleanly) — the 100x point that pins the
  * extrapolation the 100 TB claims rest on without writing a 100x
  * corpus to disk. */
object SubstrScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, sfDir)
    val docs = (if (reps <= 1) base else {
      val repl = broadcast(spark.range(reps).select(col("id").as("__rep")))
      base.crossJoin(repl)
        .withColumn("doc_id", col("doc_id") + col("__rep") * (1L << 32))
        .withColumn("text", when(col("__rep") === 0, col("text")).otherwise(
          expr("array_join(transform(split(text, ' '), (t, i) -> " +
            "if(i % 5 = 0, concat(t, '_', __rep), t)), ' ')")))
        .drop("__rep")
        .repartition(spark.sparkContext.defaultParallelism)
    }).localCheckpoint()
    val nDocs = docs.count()
    // the operators' token unit: whitespace-filtered
    val nTokens = docs.agg(sum(size(filter(split(col("text"), "\\s+"),
      t => length(t) > 0)))).head().getLong(0)
    println(s"[substr] $sfDir docs=$nDocs tokens=$nTokens")
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[substr] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    timed("dedupSubstringsGlobal(L=8)") {
      val out = graft.operators.TrainingData
        .dedupSubstringsGlobal(docs, "doc_id", "text", 8)
        .agg(count(lit(1)), sum(col("n_removed"))).head()
      println(s"[substr]   docs=${out.getLong(0)} removed=${out.getLong(1)}")
    }
    timed("redactEvalSpans(L=8, eval = 0.4% slice)") {
      val out = graft.operators.TrainingData
        .redactEvalSpans(docs, docs.where(col("doc_id") % 251 === 0),
          "doc_id", "text", 8)
        .agg(count(lit(1)), sum(col("n_redacted"))).head()
      println(s"[substr]   docs=${out.getLong(0)} redacted=${out.getLong(1)}")
    }
    spark.stop()
  }
}
