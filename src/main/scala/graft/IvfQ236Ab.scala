package graft

import org.apache.spark.sql.functions._

/** Dev one-off ([[PeelAb]]'s interleaved pattern): adjudicate the
  * round-15 q236 raw-bench outlier (0.72 s r14 → 3.56 s r15 driver
  * bench under tail load) — host vs manifest-protocol cost. q236's
  * TIMED path is loadIndex + exhausted search (staging is per-JVM);
  * this harness times the two halves separately, interleaved, on a
  * quiet host, after staging the same stale-save → rebuild protocol.
  *
  * Usage: runMain graft.IvfQ236Ab [sfDir] [rounds]. */
object IvfQ236Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_q236ab_").toString
    val stale = graft.operators.IvfIndex.train(
      emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", k = 4)
    graft.operators.IvfIndex.saveIndex(stale,
      graft.operators.IvfIndex.assign(emb, "vec_id", "embedding", stale), dir)
    graft.operators.IvfIndex.rebuildIndex(spark, dir, k = 16)
    def timed(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[q236ab] $tag $dt%.3f s")
      dt
    }
    // warm both paths once (JIT/codegen outside the measurement)
    val (m0, p0) = graft.operators.IvfIndex.loadIndex(spark, dir)
    graft.operators.IvfIndex.search(p0, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", m0, k = 5, nProbe = 16)
      .write.format("noop").mode("overwrite").save()
    val loads = Array.fill(rounds)(0.0)
    val searches = Array.fill(rounds)(0.0)
    (0 until rounds).foreach { r =>
      var mp: (graft.operators.IvfIndex.Model,
        org.apache.spark.sql.DataFrame) = null
      loads(r) = timed(s"loadIndex r$r") {
        mp = graft.operators.IvfIndex.loadIndex(spark, dir)
      }
      searches(r) = timed(s"search r$r") {
        graft.operators.IvfIndex.search(mp._2,
            emb.where(col("vec_id") < 10),
            "vec_id", "embedding", mp._1, k = 5, nProbe = 16)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // sub-part breakdown of one loadIndex
    val fs = graft.operators.StoreSwap.fsOf(spark, dir)
    var mfF: Seq[String] = null
    timed("  sub: latestManifest") {
      mfF = graft.operators.StoreSwap.latestManifest(fs, dir).get._2
    }
    var cdf: org.apache.spark.sql.DataFrame = null
    timed("  sub: centroids df construct") {
      cdf = graft.operators.StoreSwap.readStoreDir(spark, dir,
        "centroids", mfF)
    }
    timed("  sub: centroids collect") {
      cdf.select(col("cell").cast("int"),
        col("centroid").cast("array<double>")).collect()
    }
    timed("  sub: postings df construct") {
      graft.operators.StoreSwap.readStoreDir(spark, dir, "postings", mfF)
        .select(col("n_id"), col("n_vec").cast("array<double>"),
          col("cell").cast("int"))
    }
    timed("  sub: postings df construct (2nd time)") {
      graft.operators.StoreSwap.readStoreDir(spark, dir, "postings", mfF)
    }
    val pFiles = mfF.filter(_.startsWith("postings/")).map(f => s"$dir/$f")
    var oneSchema: org.apache.spark.sql.types.StructType = null
    timed("  sub: one-file schema") {
      oneSchema = spark.read.parquet(pFiles.head).schema
    }
    timed("  sub: postings df with explicit schema") {
      spark.read.schema(oneSchema).option("basePath", s"$dir/postings")
        .parquet(pFiles: _*)
    }
    timed("  sub: postings df plain dir read") {
      spark.read.parquet(s"$dir/postings")
    }
    println(s"[q236ab]   postings file count = ${pFiles.length}")
    Seq(1, 2, 4, 8, 16).filter(_ <= pFiles.length).foreach { n =>
      timed(s"  sub: explicit list of $n files") {
        spark.read.option("basePath", s"$dir/postings")
          .parquet(pFiles.take(n): _*)
      }
    }
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", 1)
    timed("  sub: explicit all files, parallel discovery") {
      spark.read.option("basePath", s"$dir/postings").parquet(pFiles: _*)
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    println(f"[q236ab] median loadIndex=${med(loads)}%.3f s " +
      f"search=${med(searches)}%.3f s")
    spark.stop()
  }
}
