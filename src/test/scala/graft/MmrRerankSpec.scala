package graft

import graft.operators.{MmrRerank, Similarity}
import org.apache.spark.sql.functions._

/** MMR greedy semantics: brute-force equality, the λ=1 identity, the
  * diversity trade at λ<1, tie order, and the loud-failure envelope. */
class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  private def at(deg: Double): Array[Float] =
    Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)

  /** Kernel arithmetic replicated independently: normalized vectors,
    * ordered-fold dots, penalty 0 for the first pick, strict-> ties. */
  private def bruteMmr(cands: Seq[(Long, Double, Array[Double])],
                       lambda: Double, k: Int): Seq[Long] = {
    val n = cands.length
    val used = Array.fill(n)(false)
    val maxSim = new Array[Double](n)
    val picks = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (s <- 0 until math.min(k, n)) {
      var best = -1
      var bestScore = 0.0
      for (i <- 0 until n if !used(i)) {
        val pen = if (s == 0) 0.0 else maxSim(i)
        val score = lambda * cands(i)._2 - (1.0 - lambda) * pen
        if (best < 0 || score > bestScore) { best = i; bestScore = score }
      }
      used(best) = true
      picks += cands(best)._1
      for (j <- 0 until n if !used(j)) {
        val d = cands(best)._3.zip(cands(j)._3).map { case (x, y) => x * y }.sum
        if (s == 0 || d > maxSim(j)) maxSim(j) = d
      }
    }
    picks.toSeq
  }

  private def norm(v: Array[Float]): Array[Double] = {
    val d = v.map(_.toDouble)
    val n = math.sqrt(d.map(x => x * x).sum)
    d.map(_ / n)
  }

  test("lambda=1 returns the run's top-kOut exactly (identity point)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val run = Similarity.bruteTopK(emb, emb.where(col("vec_id") < 5),
      "vec_id", "embedding", 8)
    val got = MmrRerank.diversify(run, emb, "vec_id", "embedding", "cos",
        lambda = 1.0, kOut = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    val want = run.where(col("rank") <= 4)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos").as("rel"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("lambda=0.5 equals the independently-recomputed greedy on a " +
    "random fixture") {
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 12L).map(i => i -> at(rnd.nextInt(360)))
    val rels = vecs.map { case (i, _) => i -> (0.3 + 0.05 * (i % 7)) }.toMap
    val run = vecs.zipWithIndex.map { case ((i, _), r) =>
      (1L, r + 1, i, rels(i)) }.toDF("q_id", "rank", "n_id", "score")
    val emb = vecs.toDF("vec_id", "embedding")
    val got = MmrRerank.diversify(run, emb, "vec_id", "embedding", "score",
        lambda = 0.5, kOut = 6)
      .orderBy("rank").select("n_id").as[Long].collect().toSeq
    // candidates enter in rank order = input order here
    val cands = vecs.map { case (i, v) => (i, rels(i), norm(v)) }
    assert(got == bruteMmr(cands, 0.5, 6))
  }

  test("diversity: with two near-identical top candidates, low lambda " +
    "picks the diverse third over the redundant twin") {
    val run = Seq((1L, 1, 10L, 0.99), (1L, 2, 11L, 0.98), (1L, 3, 12L, 0.60))
      .toDF("q_id", "rank", "n_id", "score")
    val emb = Seq((10L, at(0)), (11L, at(2)), (12L, at(90)))
      .toDF("vec_id", "embedding")
    val got = MmrRerank.diversify(run, emb, "vec_id", "embedding", "score",
        lambda = 0.3, kOut = 3)
      .orderBy("rank").select("n_id").as[Long].collect().toSeq
    // pick 1: 10 (pure relevance). pick 2: 11 scores .3*.98-.7*cos(2°)
    // ≈ -.405, 12 scores .3*.60-.7*cos(90°)=.18 -> 12. pick 3: 11.
    assert(got == Seq(10L, 12L, 11L))
  }

  test("score ties select the better original rank") {
    val run = Seq((1L, 1, 20L, 0.5), (1L, 2, 21L, 0.5), (1L, 3, 22L, 0.5))
      .toDF("q_id", "rank", "n_id", "score")
    val emb = Seq((20L, at(0)), (21L, at(120)), (22L, at(240)))
      .toDF("vec_id", "embedding")
    val got = MmrRerank.diversify(run, emb, "vec_id", "embedding", "score",
        lambda = 1.0, kOut = 3)
      .orderBy("rank").select("n_id").as[Long].collect().toSeq
    assert(got == Seq(20L, 21L, 22L))
  }

  test("a run candidate missing from emb raises loudly, naming the id") {
    val run = Seq((1L, 1, 10L, 0.9), (1L, 2, 99L, 0.8))
      .toDF("q_id", "rank", "n_id", "score")
    val emb = Seq((10L, at(0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      MmrRerank.diversify(run, emb, "vec_id", "embedding", "score",
        0.5, 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("n_id=99") &&
      m.contains("no embedding")), msgs(e).toString)
  }

  test("refusals: kOut <= 0, lambda outside [0, 1]") {
    val run = Seq((1L, 1, 10L, 0.9)).toDF("q_id", "rank", "n_id", "score")
    val emb = Seq((10L, at(0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      MmrRerank.diversify(run, emb, "vec_id", "embedding", "score", 0.5, 0)
    }
    intercept[IllegalArgumentException] {
      MmrRerank.diversify(run, emb, "vec_id", "embedding", "score", -0.1, 1)
    }
    intercept[IllegalArgumentException] {
      MmrRerank.diversify(run, emb, "vec_id", "embedding", "score", 1.1, 1)
    }
  }

  test("partitioning independence (canonical rank-ordered fold)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val run = Similarity.bruteTopK(emb, emb.where(col("vec_id") < 6),
      "vec_id", "embedding", 10)
    def go(r: org.apache.spark.sql.DataFrame,
           e: org.apache.spark.sql.DataFrame) =
      MmrRerank.diversify(r, e, "vec_id", "embedding", "cos", 0.4, 5)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
        .sorted.toSeq
    val a = go(run, emb)
    val b = go(run.repartition(7), emb.repartition(3))
    assert(a == b && a.nonEmpty)
  }
}
