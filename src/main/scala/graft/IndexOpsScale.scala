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
  * Usage: runMain graft.IndexOpsScale [sfDir] [mhCopies] [sections]
  * (default sf0.1, "5,20", "base"). `sections` picks measurement
  * groups: "base" = the full pre-r18 flow; "anchors" = the r18 100×
  * cold-load + delta-ingest anchors for the IVF / BM25-stats /
  * semantic families (the q-family analog of the MinHash 100× table). */
object IndexOpsScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val sections = args.lift(2).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("base"))
    def sect(s: String): Boolean = sections.contains(s)
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
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      })
    def measuredBytes(tag: String)(body: => Unit): Unit = {
      Thread.sleep(1500) // drain listener events from prior jobs
      bytesRead.set(0L)
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the bus deliver the last task metrics
      println(f"[indexops] $tag ${dt}%.3f s " +
        f"bytesRead=${bytesRead.get() / 1048576.0}%.1f MiB")
    }
    // Warehouse manifest scale (r16 verdict weak #2): cold PRUNED reads
    // must be FLAT in the manifest's listed-file count. Protocol: save
    // the reference-shaped warehouse; cold-read one year; 10x the fact
    // file count with appends; re-read; then inflate the manifest past
    // 100k listed files (real marker files in partitions the year
    // filter prunes away — the segment roll-up and its commit cost are
    // part of the measurement) and re-read. The explicit-path A/B arm
    // is the old read (~2.5 ms/listed file — at 100k files ~4 min,
    // which is why it runs at the 10x point, not the 100k one).
    if (sect("base") || sect("wh")) {
      import graft.operators.StoreSwap
      val whDir = s"$base/wh"
      val wh = graft.etl.ReferenceShapedData.warehouse(spark, sfDir)
      timed("warehouse save (base)") {
        graft.sources.WarehouseStore.save(wh, whDir)
      }
      val fs = StoreSwap.fsOf(spark, whDir)
      def factFiles(): Int = StoreSwap.latestManifest(fs, whDir).get._2
        .count(_.startsWith("fact_sales/"))
      def coldPruned(tag: String, keepCaches: Boolean = false): Unit = {
        val label = s"warehouse ${if (keepCaches) "warm" else "cold"} " +
          s"loadFactYear(1995) [$tag, ${factFiles()} fact files listed]"
        // factFiles() above expanded the manifest and warmed the size +
        // segment caches — drop them unless this row MEASURES warmth
        if (!keepCaches) StoreSwap.clearPathCaches(whDir)
        timed(label) {
          graft.sources.WarehouseStore.loadFactYear(spark, whDir, 1995)
            .agg(count(lit(1))).collect()
        }
      }
      coldPruned("base")
      timed("warehouse 9 appends (10x the fact file count)") {
        (1 to 9).foreach { i =>
          graft.sources.WarehouseStore.saveFact(
            wh.factSales.withColumn("fact_id",
              col("fact_id") + lit(i * 100000000L)),
            whDir, org.apache.spark.sql.SaveMode.Append)
        }
      }
      coldPruned("10x files")
      timed(s"warehouse explicit-path read A/B [${factFiles()} files, " +
        "the old per-path constant]") {
        val (_, mf) = StoreSwap.latestManifest(fs, whDir).get
        StoreSwap.readStoreDirExplicit(spark, whDir, "fact_sales", mf)
          .where(col("p_year") === 1995).agg(count(lit(1))).collect()
      }
      timed("warehouse manifest inflation to 100k+ listed files " +
        "(real small-file copies + one segmented commit)") {
        val root = java.nio.file.Paths.get(s"$whDir/fact_sales")
        val (v, mf) = StoreSwap.latestManifest(fs, whDir).get
        // replicate one REAL committed fact file 100k times into
        // partitions the 1995 filter prunes away — valid parquet, so
        // the invariant "every listed file is readable" holds
        val seed = java.nio.file.Paths.get(
          s"$whDir/${mf.find(_.startsWith("fact_sales/")).get}")
        val fakes = (0 until 100000).map { i =>
          f"fact_sales/p_year=1900/p_month=${i % 12 + 1}/zz$i%06d.parquet"
        }
        (1 to 12).foreach(m => java.nio.file.Files.createDirectories(
          root.resolve(s"p_year=1900/p_month=$m")))
        fakes.foreach(fk => java.nio.file.Files.copy(seed,
          java.nio.file.Paths.get(s"$whDir/$fk")))
        StoreSwap.commitManifest(fs, whDir, v + 1, mf ++ fakes)
      }
      coldPruned("100k+ listed files")
      // r18: the pruned read now ALSO prunes the manifest expansion
      // itself (prefix-tagged segments) and caches parsed segments —
      // a REPEAT pruned read must cost ≈ the 80-file constant
      coldPruned("100k+ repeat (segment cache + prefix pruning)", keepCaches = true)
      coldPruned("100k+ repeat 2", keepCaches = true)
      timed("warehouse delta append on the 100k-file manifest " +
        "(segments must carry by reference)") {
        graft.sources.WarehouseStore.saveFact(
          wh.factSales.limit(500).withColumn("fact_id",
            col("fact_id") + lit(99L * 1000000000L)),
          whDir, org.apache.spark.sql.SaveMode.Append)
      }
      coldPruned("100k+ post-append")
      coldPruned("100k+ post-append repeat", keepCaches = true)
    }
    if (sect("base")) {
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
    // bytes-read pruning (round-14 verdict #1's gate): a SMALL delta
    // against the FULL store, with the band-keyed bandidx projection
    // (partition-pruned candidate lookup + pb-pruned seen/verify
    // probes) vs the same store with the projection removed (the
    // legacy full-scan path). Bucket counts sized to the pruning
    // regime — the delta's key set must be smaller than the bucket
    // count for any layout to prune (see Dedup.storeLayout's note).
    // the proportionality claim is "bytes follow the DELTA, not the
    // store": grow the store 4x and show the pruned ingest's read stays
    // ~flat while the legacy full-scan path grows with the store. The
    // corpus is replicated with offset ids (docs stay genuinely
    // distinct for the id-keyed layout; band keys repeat, which only
    // ADDS candidate work — conservative for the pruned arm).
    def corpus(copies: Int) = (0 until copies)
      .map(c => docs.select((col("doc_id") + c.toLong * 1000000L)
        .as("doc_id"), col("text")))
      .reduce(_ unionAll _).localCheckpoint()
    // NOVEL texts (reversed + id-salted): the delta must not near-dup
    // the store, or the measured bytes are dominated by the genuine
    // verify work on a candidate set that grows with store replication
    def delta(offset: Long) = docs.limit(16)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(lit("novel "), col("doc_id").cast("string"), lit(" "),
          reverse(col("text"))).as("text"))
      .localCheckpoint()
    // copies arms from args (default 5,20; pass "5,20,100" for the
    // 100x anchor run — the store save dominates the wall time)
    val mhCopies = args.lift(1).getOrElse("5,20")
      .split(",").toSeq.map(_.trim.toInt)
    mhCopies.foreach { copies =>
      val store = s"$base/mh_x$copies"
      timed(s"minhash saveStore(${copies}x corpus)") {
        graft.operators.Dedup.saveMinhashStore(corpus(copies), "doc_id",
          "text", store, storeBuckets = 128, bandBuckets = 1024)
      }
      val storeBytes = org.apache.commons.io.FileUtils
        .sizeOfDirectory(new java.io.File(store))
      println(f"[indexops] minhash ${copies}x store on disk " +
        f"${storeBytes / 1048576.0}%.1f MiB (the r14 shape re-read " +
        "postings+bands of this per batch)")
      measuredBytes(s"minhash incremental(16-doc delta, ${copies}x store, " +
        "bandidx pruned)") {
        graft.operators.Dedup.minhashIncremental(delta(100000000L),
          "doc_id", "text", store, 0.4)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$store/bandidx"), true)
      measuredBytes(s"minhash incremental(16-doc delta, ${copies}x store, " +
        "legacy full scan)") {
        graft.operators.Dedup.minhashIncremental(delta(200000000L),
          "doc_id", "text", store, 0.4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // Cold full-store derive at scale, on SALTED replicas: every token
    // is copy-prefixed, so cross-copy similarity vanishes and the
    // corpus keeps the BASE duplicate rate — true pairs grow ~linearly
    // with copies. (Identical-text replication would make every doc a
    // <copies>-way near-dup cluster: at 100x that is ~25M true pairs
    // and a quadratic verify — a workload artifact, not a store cost.)
    def saltedCorpus(copies: Int) = (0 until copies)
      .map(c => docs.select((col("doc_id") + c.toLong * 1000000L)
        .as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"c$c"), t)), " ").as("text")))
      .reduce(_ unionAll _).localCheckpoint()
    mhCopies.foreach { copies =>
      val sStore = s"$base/mh_s$copies"
      timed(s"minhash saveStore(salted ${copies}x corpus)") {
        graft.operators.Dedup.saveMinhashStore(saltedCorpus(copies),
          "doc_id", "text", sStore, storeBuckets = 128, bandBuckets = 1024)
      }
      timed(s"minhash cold derivePairsFromStore(salted ${copies}x store)") {
        val n = graft.operators.Dedup.derivePairsFromStore(spark, sStore, 0.4)
          .count()
        println(s"[indexops]   pairs=$n")
      }
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
    // Semantic store (family 4): verb wall-times at a replicated
    // corpus, then the read-pruning measure — a small ingest delta's
    // bytesRead vs the full-store derive. Two honesty notes. (1) The
    // listener's bytesRead includes localCheckpoint BLOCK reads (the
    // dominant term here — uncompressed row blocks re-read by the join
    // sides), so the number tracks total rows TOUCHED, which is
    // exactly the proportionality claim. (2) Pruning is
    // fraction-of-cells (touched/k of `vectors/` plus touched-pb of
    // `idmap/`), so the claim is the RATIO to the full-store derive,
    // not flatness: per-cell row counts grow with the store unless k
    // is scaled with the corpus (the mass guard's k ≈ corpus/10⁴
    // sizing, which also keeps the within-cell quadratic bounded).
    def embCorpus(copies: Int) = (0 until copies)
      .map(c => emb.select((col("vec_id") + c.toLong * 10000000L)
        .as("vec_id"), col("embedding")))
      .reduce(_ unionAll _).localCheckpoint()
    Seq(10, 40).foreach { copies =>
      val store = s"$base/sem_x$copies"
      val corpusC = embCorpus(copies)
      val semModel = graft.operators.IvfIndex.train(
        corpusC, "vec_id", "embedding", 64)
      timed(s"semantic save(${copies}x corpus, k=64)") {
        graft.operators.SemanticStore.save(corpusC, "vec_id", "embedding",
          store, semModel)
      }
      println(f"[indexops] semantic ${copies}x store on disk " +
        f"${org.apache.commons.io.FileUtils.sizeOfDirectory(
          new java.io.File(store)) / 1048576.0}%.1f MiB")
      val semDelta = emb.limit(4)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
        .localCheckpoint()
      measuredBytes(s"semantic ingest(4-vector delta, ${copies}x store)") {
        graft.operators.SemanticStore.ingest(semDelta, "vec_id",
          "embedding", store, 0.9)
          .write.format("noop").mode("overwrite").save()
      }
      // the guard is part of the measurement: growing the corpus 4x
      // without more cells trips the within-cell mass refusal (the
      // k ≈ corpus/10⁴ contract); the full derive then runs with the
      // deliberate override, exactly like SemDedupScale's worst case
      try graft.operators.SemanticStore.deriveSurvivors(spark, store, 0.9)
        .write.format("noop").mode("overwrite").save()
      catch { case e: IllegalArgumentException =>
        println(s"[indexops] semantic derive(${copies}x) guard trip: " +
          e.getMessage.takeWhile(_ != '.'))
      }
      measuredBytes(s"semantic deriveSurvivors(full, ${copies}x store, " +
        "guard overridden)") {
        graft.operators.SemanticStore.deriveSurvivors(spark, store, 0.9,
            maxCellPairs = Long.MaxValue)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"semantic purge(a 1/7 takedown, ${copies}x store)") {
        val n = graft.operators.SemanticStore.purge(spark, store,
          corpusC.where(col("vec_id") % 7 === 0).select(col("vec_id")),
          "vec_id")
        println(s"[indexops]   purged=$n")
      }
      timed(s"semantic compact+vacuum(${copies}x store)") {
        graft.operators.SemanticStore.compact(spark, store)
      }
    }
    } // sect("base")
    // ------------------------------------------------------------------
    // r18 100× anchors: the MinHash-table analog for the other three
    // manifest families — at 10× and 100× the corpus, (a) COLD load +
    // first query wall (the zero-listing claim), (b) a 16-row delta
    // ingest's bytesRead (the bytes-follow-the-delta claim). Run with
    // sections="anchors".
    if (sect("anchors")) {
      def replicate(df: org.apache.spark.sql.DataFrame, idCol: String,
                    copies: Int) = (0 until copies)
        .map(c => df.withColumn(idCol, col(idCol) + lit(c.toLong * 10000000L)))
        .reduce(_ unionAll _).localCheckpoint()
      Seq(10, 100).foreach { copies =>
        // --- IVF ---
        val ivfStore = s"$base/anchor_ivf_x$copies"
        val vecs = replicate(emb.select(col("vec_id"), col("embedding")),
          "vec_id", copies)
        val k = if (copies >= 100) 64 else 16
        val m = graft.operators.IvfIndex.train(vecs, "vec_id", "embedding", k)
        timed(s"ivf saveIndex(${copies}x corpus, k=$k)") {
          graft.operators.IvfIndex.saveIndex(m,
            graft.operators.IvfIndex.assign(vecs, "vec_id", "embedding", m),
            ivfStore)
        }
        println(f"[indexops] ivf ${copies}x store on disk " +
          f"${org.apache.commons.io.FileUtils.sizeOfDirectory(
            new java.io.File(ivfStore)) / 1048576.0}%.1f MiB")
        graft.operators.StoreSwap.clearPathCaches(ivfStore) // cold
        val queries = emb.limit(8).select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        measuredBytes(s"ivf COLD load + top-5 search(${copies}x store)") {
          val (lm, post) = graft.operators.IvfIndex.loadIndex(spark, ivfStore)
          graft.operators.IvfIndex.search(post, queries, "vec_id",
            "embedding", lm, k = 5, nProbe = 4)
            .write.format("noop").mode("overwrite").save()
        }
        val ivfDelta = emb.limit(16)
          .select((col("vec_id") + 5000000000L).as("vec_id"), col("embedding"))
          .localCheckpoint()
        measuredBytes(s"ivf appendToIndex(16-vector delta, ${copies}x store)") {
          graft.operators.IvfIndex.appendToIndex(spark, ivfStore, ivfDelta,
            "vec_id", "embedding")
        }
        // --- BM25 stats ---
        val bmStore = s"$base/anchor_bm25_x$copies"
        val corpus = replicate(docs.select(col("doc_id"), col("text")),
          "doc_id", copies)
        timed(s"bm25 saveCorpusStats(${copies}x corpus)") {
          graft.operators.TextSearch.saveCorpusStats(corpus, "doc_id",
            "text", bmStore)
        }
        println(f"[indexops] bm25 ${copies}x store on disk " +
          f"${org.apache.commons.io.FileUtils.sizeOfDirectory(
            new java.io.File(bmStore)) / 1048576.0}%.1f MiB")
        graft.operators.StoreSwap.clearPathCaches(bmStore) // cold
        measuredBytes(s"bm25 COLD indexed top-20 search(${copies}x store)") {
          graft.operators.TextSearch.bm25TopKIndexed(corpus, "doc_id",
            "text", bmStore, Seq("spark", "vector", "join"), k = 20)
            .write.format("noop").mode("overwrite").save()
        }
        val bmDelta = docs.limit(16)
          .select((col("doc_id") + 5000000000L).as("doc_id"),
            concat(lit("novel "), col("doc_id").cast("string"), lit(" "),
              reverse(col("text"))).as("text"))
          .localCheckpoint()
        measuredBytes(s"bm25 appendCorpusStats(16-doc delta, ${copies}x store)") {
          graft.operators.TextSearch.appendCorpusStats(bmDelta, "doc_id",
            "text", bmStore)
        }
        // --- Semantic store ---
        val semStore = s"$base/anchor_sem_x$copies"
        val semK = if (copies >= 100) 64 else 16
        val semModel = graft.operators.IvfIndex.train(vecs, "vec_id",
          "embedding", semK)
        timed(s"semantic save(${copies}x corpus, k=$semK)") {
          graft.operators.SemanticStore.save(vecs, "vec_id", "embedding",
            semStore, semModel)
        }
        println(f"[indexops] semantic ${copies}x store on disk " +
          f"${org.apache.commons.io.FileUtils.sizeOfDirectory(
            new java.io.File(semStore)) / 1048576.0}%.1f MiB")
        graft.operators.StoreSwap.clearPathCaches(semStore) // cold
        val semDelta = emb.limit(4)
          .select((col("vec_id") + 5000000000L).as("vec_id"), col("embedding"))
          .localCheckpoint()
        measuredBytes(s"semantic COLD ingest(4-vector delta, ${copies}x store)") {
          graft.operators.SemanticStore.ingest(semDelta, "vec_id",
            "embedding", semStore, 0.9)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
