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
  * Usage: runMain graft.SubstrScale [sfDir] (default sf0.1). */
object SubstrScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
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
