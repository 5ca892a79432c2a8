package graft

import graft.operators.PqIndex
import org.apache.spark.sql.functions._

/** Product quantization: encode/ADC exactness on perfectly-quantizable
  * fixtures, training determinism, and the loud-refusal envelope. */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  // exact dyadic codebook: 4 subspaces x 4 centroids x 2 dims
  private val cb: Array[Array[Array[Double]]] = Array.tabulate(4, 4, 2) {
    (j, c, d) => if (d == 0) j + c * 0.25 else c * 0.5 - 1.0
  }
  private val model = PqIndex.Model(cb)

  // vectors ARE centroid concatenations: code of vec i in subspace j is
  // (i + j) % 4, so encode is fully determined and ADC == exact L2²
  private def vec(i: Int): Array[Float] =
    (0 until 4).flatMap { j =>
      cb(j)((i + j) % 4).map(_.toFloat)
    }.toArray

  private lazy val corpus =
    (0 until 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("encode recovers the constructed codes exactly (first-index tie " +
    "rule, native kernel per subspace)") {
    val got = PqIndex.encode(corpus, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    (0 until 20).foreach { i =>
      assert(got(i.toLong) == (0 until 4).map(j => (i + j) % 4), s"vec $i")
    }
  }

  test("ADC search on perfectly-quantized vectors equals brute-force L2 " +
    "ranking exactly (adc IS the true squared distance)") {
    val codes = PqIndex.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.where(col("vec_id") < 4)
    val got = PqIndex.search(codes, queries, "vec_id", "embedding", model,
        kTop = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    val vs = (0 until 20).map(i => i.toLong -> vec(i).map(_.toDouble)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = (0L until 4L).flatMap { q =>
      (0L until 20L).filter(_ != q)
        .map(n => (n, l2(vs(q), vs(n))))
        .sortBy { case (n, d) => (d, n) }
        .take(5).zipWithIndex
        .map { case ((n, d), r) =>
          (q, r + 1, n, math.rint(d * 1e6) / 1e6)
        }
    }.sorted
    assert(got == want)
  }

  test("searchInCells: all-cells probe equals the exhaustive ADC search " +
    "exactly; a pruned probe returns a subset with identical adc values") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pq = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16)
    val ivf = graft.operators.IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    val codes = PqIndex.encode(emb, "vec_id", "embedding", pq)
    val cells = graft.operators.IvfIndex
      .assign(emb, "vec_id", "embedding", ivf)
    val queries = emb.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    val full = rows(PqIndex.search(codes, queries, "vec_id", "embedding",
      pq, kTop = 5))
    val allCells = rows(PqIndex.searchInCells(codes, cells, queries,
      "vec_id", "embedding", ivf, pq, kTop = 5, nProbe = 8))
    assert(allCells == full)
    val pruned = PqIndex.searchInCells(codes, cells, queries,
      "vec_id", "embedding", ivf, pq, kTop = 5, nProbe = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val fullAdc = PqIndex.search(codes, queries, "vec_id", "embedding",
      pq, kTop = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    assert(pruned.nonEmpty)
    pruned.foreach { case (k, adc) =>
      assert(fullAdc(k) == adc, s"adc drift for $k")
    }
  }

  test("searchRerank: exact l2 on the shortlist — on perfectly-quantized " +
    "vectors any shortlist >= kTop reproduces brute force; returned " +
    "distances are exact regardless of shortlist") {
    val codes = PqIndex.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.where(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    val brute = rows(PqIndex.searchRerank(codes, corpus, queries,
      "vec_id", "embedding", model, kTop = 5, shortlist = 1000))
    val tight = rows(PqIndex.searchRerank(codes, corpus, queries,
      "vec_id", "embedding", model, kTop = 5, shortlist = 5))
    assert(tight == brute) // perfect quantization: ADC order == exact order
    // realistic corpora: every returned distance is the true L2^2
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val trained = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16)
    val ecodes = PqIndex.encode(emb, "vec_id", "embedding", trained)
    val out = PqIndex.searchRerank(ecodes, emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", trained, kTop = 3, shortlist = 12)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val vs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    out.foreach { case ((q, n), got) =>
      val d = vs(q).zip(vs(n)).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(got - math.rint(d * 1e6) / 1e6) < 1e-9, s"($q,$n)")
    }
    intercept[IllegalArgumentException] {
      PqIndex.searchRerank(ecodes, emb, emb.limit(1), "vec_id", "embedding",
        trained, kTop = 5, shortlist = 3)
    }
  }

  test("saveModel/loadModel: bit-exact round trip, corrupt tables refuse " +
    "at load") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val trained = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_pq_spec_${System.nanoTime()}")
    dir.deleteOnExit()
    PqIndex.saveModel(trained, dir.getAbsolutePath, spark)
    val loaded = PqIndex.loadModel(spark, dir.getAbsolutePath)
    assert(loaded.m == trained.m && loaded.k == trained.k)
    loaded.codebooks.zip(trained.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
    }
    // loaded model answers identically
    val codes = PqIndex.encode(emb, "vec_id", "embedding", trained)
    val lcodes = PqIndex.encode(emb, "vec_id", "embedding", loaded)
    assert(codes.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet ==
      lcodes.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet)
    // a model table missing a centroid refuses at load
    val broken = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_pq_broken_${System.nanoTime()}")
    broken.deleteOnExit()
    spark.read.parquet(dir.getAbsolutePath)
      .where(!(col("subspace") === 3 && col("centroid") === 7))
      .write.parquet(broken.getAbsolutePath)
    intercept[IllegalArgumentException] {
      PqIndex.loadModel(spark, broken.getAbsolutePath)
    }
  }

  test("train is deterministic, partitions the dimensionality, and " +
    "refuses bad shapes loudly") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m1 = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16)
    val m2 = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16)
    assert(m1.m == 8 && m1.k == 16 && m1.ds == 8 && m1.dim == 64)
    m1.codebooks.zip(m2.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
    }
    // trained codes cover a reasonable spread (not all vectors in one cell)
    val codes = PqIndex.encode(emb, "vec_id", "embedding", m1)
      .select(explode(col("pq_code")).as("c"))
      .distinct().collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 16) && codes.length > 4)
    intercept[IllegalArgumentException] {
      PqIndex.train(emb, "vec_id", "embedding", m = 7, k = 4) // 64 % 7 != 0
    }
    intercept[IllegalArgumentException] {
      PqIndex.train(emb.limit(3), "vec_id", "embedding", m = 8, k = 16) // k > sample
    }
    // encode against a wrong-dimensionality vector fails loudly per row
    val bad = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      PqIndex.encode(bad, "vec_id", "embedding", m1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimension mismatch")), msgs(e))
  }

  test("search plan gate: top-k reduces through partial+final " +
    "TopKPerKeyExec bounded heaps, not a Window over the full scored " +
    "product") {
    // a GraftExtensions session carries the strategy; a plain test
    // session gets it the same way TopK.perKey self-installs it
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(graft.plans.TopKStrategy))
        exp.extraStrategies = exp.extraStrategies :+ graft.plans.TopKStrategy
    }
    val codes = PqIndex.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.where(col("vec_id") < 4)
    val out = PqIndex.search(codes, queries, "vec_id", "embedding", model,
      kTop = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2,
      s"expected partial+final bounded heaps:\n${plan.take(2000)}")
    assert(!plan.contains("Window"),
      s"window rank leaked into the PQ search plan:\n${plan.take(2000)}")
    // and the routed plan still answers the hand-computed exact ranking
    // (the dyadic fixture makes ADC the true L2², so this doubles as the
    // native-vs-window equivalence oracle)
    val native = out.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getDouble(3))).sorted.toSeq
    val vs = (0 until 20).map(i => i.toLong -> vec(i).map(_.toDouble)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = (0L until 4L).flatMap { q =>
      (0L until 20L).filter(_ != q)
        .map(n => (n, l2(vs(q), vs(n))))
        .sortBy { case (n, d) => (d, n) }
        .take(5).zipWithIndex
        .map { case ((n, d), r) => (q, r + 1, n, math.rint(d * 1e6) / 1e6) }
    }.sorted
    assert(native == want)
  }

  test("searchRerank guard: an over-bound query table drops EVERY " +
    "broadcast hint (shortlist stage AND re-rank join) and answers " +
    "identically to the broadcast path") {
    import org.apache.spark.sql.functions.{array, lit}
    val cap = PqIndex.MaxBroadcastQueries
    val vecCols = array((0 until 8).map(i =>
      lit(model.codebooks(i % 4)((i / 2) % 4)(i % 2).toFloat)): _*)
    val big = spark.range(0, cap + 1)
      .select((col("id") + 1000000L).as("vec_id"), vecCols.as("embedding"))
      .where(col("vec_id") >= 1000000L) // filter hides maxRows: real probe
    val codes = PqIndex.encode(corpus, "vec_id", "embedding", model)
    val outBig = PqIndex.searchRerank(codes, corpus, big, "vec_id",
      "embedding", model, kTop = 3, shortlist = 6)
    assert(!outBig.queryExecution.analyzed.toString.toLowerCase
      .contains("broadcast"),
      "over-bound query table must not be hinted anywhere in rerank")
    val one = big.where(col("vec_id") === 1000000L)
    val outOne = PqIndex.searchRerank(codes, corpus, one, "vec_id",
      "embedding", model, kTop = 3, shortlist = 6)
    assert(outOne.queryExecution.analyzed.toString.toLowerCase
      .contains("broadcast"), "small query table keeps the fast path")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sorted.toSeq
    assert(rows(outBig.where(col("q_id") === 1000000L)) == rows(outOne))
  }
}
