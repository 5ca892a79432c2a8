package graft

import org.apache.spark.sql.functions._

/** Dev one-off ([[SemDedupScale]]'s pattern): wall-time the round-14
  * PERSISTED-ARTIFACT operators — incremental MinHash ingest, BM25
  * stats purge, IVF postings purge, IVF rebuild — at a given corpus so
  * SCALE.md can carry measured sf0.1 → sf1.0 ratios for the ingest
  * paths themselves (the q232–q236 gates stage once and time only the
  * post-stage search, correctly for the bench but silent on the
  * mutation cost).
  *
  * Usage: runMain graft.IndexOpsScale [sfDir] (default sf0.1). */
object IndexOpsScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    println(s"[indexops] $sfDir docs=${docs.count()} emb=${emb.count()}")
    val base = java.nio.file.Files
      .createTempDirectory("graft_indexops_").toString
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[indexops] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // MinHash store: bootstrap on even half, ingest odd half as a delta
    timed("minhash saveStore(even half)") {
      graft.operators.Dedup.saveMinhashStore(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text", s"$base/mh")
    }
    timed("minhash incremental(odd half)") {
      graft.operators.Dedup.minhashIncremental(
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
        s"$base/mh", 0.4).write.format("noop").mode("overwrite").save()
    }
    timed("minhash purgeStore(third)") {
      val n = graft.operators.Dedup.purgeMinhashStore(spark, s"$base/mh",
        docs.where(col("doc_id") % 3 === 0).select(col("doc_id")), "doc_id")
      println(s"[indexops]   purged=$n")
    }
    timed("minhash compactStore") {
      graft.operators.Dedup.compactMinhashStore(spark, s"$base/mh")
    }
    // BM25 stats: save all, purge a fifth
    timed("bm25 saveCorpusStats(all)") {
      graft.operators.TextSearch.saveCorpusStats(
        docs, "doc_id", "text", s"$base/bm25")
    }
    timed("bm25 purgeCorpusStats(fifth)") {
      graft.operators.TextSearch.purgeCorpusStats(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text", s"$base/bm25")
    }
    // IVF: save all, purge a seventh, rebuild k=16
    val model = graft.operators.IvfIndex.train(emb, "vec_id", "embedding", 16)
    timed("ivf saveIndex(all)") {
      graft.operators.IvfIndex.saveIndex(model,
        graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", model),
        s"$base/ivf")
    }
    timed("ivf purgeFromIndex(seventh)") {
      val n = graft.operators.IvfIndex.purgeFromIndex(spark, s"$base/ivf",
        emb.where(col("vec_id") % 7 === 0).select(col("vec_id")), "vec_id")
      println(s"[indexops]   purged=$n")
    }
    timed("ivf rebuildIndex(k=16)") {
      graft.operators.IvfIndex.rebuildIndex(spark, s"$base/ivf", 16)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
