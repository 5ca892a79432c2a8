package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Integer-protocol equality against a hand-written reference replay,
  * determinism, learnability, scoring contract, persistence, refusals. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** The whole training protocol as plain driver-side loops — the
    * executable spec train() must match bit for bit. */
  private def refTrain(feats: Map[(Long, Int), Long],
                       labels: Map[Long, Long], dim: Int, iters: Int,
                       lrDiv: Int): (Long, Array[Long]) = {
    var w = Array.fill(dim)(0L)
    var b = 0L
    val n = labels.size.toLong
    for (_ <- 1 to iters) {
      val errs = labels.map { case (doc, y) =>
        val margin = b + feats.collect {
          case ((d, j), x) if d == doc => w(j) * x
        }.sum
        val p = math.min(math.max(margin / 4 + 500000L, 0L), 1000000L)
        doc -> (p - y * 1000000L)
      }
      val gj = Array.fill(dim)(0L)
      feats.foreach { case ((d, j), x) => gj(j) += errs(d) * x }
      val gb = errs.values.sum
      for (j <- 0 until dim) w(j) -= gj(j) / (n * lrDiv)
      b -= gb / (n * lrDiv)
    }
    (b, w)
  }

  private val posVocab = Seq("alpha", "beta", "gamma", "delta")
  private val negVocab = Seq("omicron", "sigma", "tau", "upsilon")

  private def corpus(n: Int) = (0 until n).map { i =>
    val vocab = if (i % 2 == 0) posVocab else negVocab
    val words = (0 to i % 5).map(k => vocab((i + k) % vocab.length))
    (i.toLong, words.mkString(" "), (i + 1) % 2)
  }.toDF("doc_id", "text", "label")

  test("train == driver-side reference replay, bit for bit, and is " +
    "partitioning-invariant") {
    val docs = corpus(40)
    val dim = 8
    val feats = QualityClassifier.featurize(docs, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val labels = docs.select("doc_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val (bRef, wRef) = refTrain(feats, labels, dim, iters = 3, lrDiv = 4)
    val m = QualityClassifier.train(docs, "doc_id", "text", "label",
      dim = dim, iters = 3, lrDiv = 4)
    assert(m.biasMicro == bRef)
    assert(m.weightsMicro.toSeq == wRef.toSeq)
    val m2 = QualityClassifier.train(docs.repartition(7), "doc_id",
      "text", "label", dim = dim, iters = 3, lrDiv = 4)
    assert(m2.biasMicro == m.biasMicro)
    assert(m2.weightsMicro.toSeq == m.weightsMicro.toSeq)
  }

  test("learnability: disjoint vocabularies separate on the training " +
    "set; scores respect the 0.5 prediction threshold") {
    val docs = corpus(60)
    val m = QualityClassifier.train(docs, "doc_id", "text", "label",
      dim = 32, iters = 5, lrDiv = 4)
    val scored = QualityClassifier.score(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id").as("doc"), col("label")), Seq("doc"))
    val acc = scored.where((col("pred") && col("label") === 1) ||
        (!col("pred") && col("label") === 0)).count().toDouble /
      scored.count()
    assert(acc >= 0.9, s"training accuracy $acc")
    // pred is exactly score >= 0.5 at micro precision
    assert(scored.where(col("pred") =!= (col("score") >= 0.5)).count() == 0)
  }

  test("token-less documents score at the bias; every doc appears") {
    val docs = Seq((1L, "alpha beta", 1), (2L, "", 0), (3L, "   ", 1))
      .toDF("doc_id", "text", "label")
    val m = QualityClassifier.Model(4, 250000L, Array(0L, 0L, 0L, 0L))
    val out = QualityClassifier.score(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // margin = bias = 0.25e6 -> p = 250000/4... no: p = 250000 DIV 4
    // + 500000 = 562500
    assert(out(2L) == 0.5625 && out(3L) == 0.5625)
  }

  test("hard sigmoid saturates and truncation matches toward-zero " +
    "semantics on negative margins") {
    // bias -3e6: p = -3000000 DIV 4 + 500000 = -250000 -> clamp 0
    val low = QualityClassifier.Model(2, -3000000L, Array(0L, 0L))
    val docs = Seq((1L, "", 0)).toDF("doc_id", "text", "label")
    assert(QualityClassifier.score(docs, "doc_id", "text", low)
      .collect()(0).getDouble(1) == 0.0)
    // bias -2: DIV truncates toward zero -> -2 DIV 4 = 0, p = 500000,
    // and the >= threshold predicts true
    val tiny = QualityClassifier.Model(2, -2L, Array(0L, 0L))
    val r = QualityClassifier.score(docs, "doc_id", "text", tiny).collect()(0)
    assert(r.getDouble(1) == 0.5 && r.getBoolean(2))
  }

  test("save/load round trip is exact; structural validation refuses " +
    "corrupt layouts") {
    val m = QualityClassifier.Model(4, -7L, Array(1L, -2L, 3L, 0L))
    val dir = java.nio.file.Files.createTempDirectory("qc").toFile
    val p = new java.io.File(dir, "m").getAbsolutePath
    QualityClassifier.saveModel(spark, m, p)
    val l = QualityClassifier.loadModel(spark, p)
    assert(l.dim == 4 && l.biasMicro == -7L &&
      l.weightsMicro.toSeq == m.weightsMicro.toSeq)
    val p2 = new java.io.File(dir, "nobias").getAbsolutePath
    Seq((0, 1L), (1, 2L)).toDF("j", "w_micro")
      .write.mode("overwrite").parquet(p2)
    intercept[IllegalArgumentException] {
      QualityClassifier.loadModel(spark, p2)
    }
    val p3 = new java.io.File(dir, "gap").getAbsolutePath
    Seq((-1, 0L), (0, 1L), (2, 2L)).toDF("j", "w_micro")
      .write.mode("overwrite").parquet(p3)
    intercept[IllegalArgumentException] {
      QualityClassifier.loadModel(spark, p3)
    }
  }

  test("refusals: bad labels, dim/iters/lrDiv bounds, empty corpus") {
    val docs = Seq((1L, "x", 2)).toDF("doc_id", "text", "label")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(docs, "doc_id", "text", "label")
    }
    val ok = Seq((1L, "x", 1)).toDF("doc_id", "text", "label")
    intercept[IllegalArgumentException] {
      QualityClassifier.train(ok, "doc_id", "text", "label", dim = 1)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(ok, "doc_id", "text", "label", iters = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(ok, "doc_id", "text", "label", lrDiv = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(ok.where(col("doc_id") < 0), "doc_id",
        "text", "label")
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.Model(4, 0L, Array(0L))
    }
  }
}
