package graft

import graft.operators.ClassifierEval

/** Exact AUC vs brute-force pair counting, tie handling, calibration
  * bin arithmetic, invariance, refusals. */
class ClassifierEvalSpec extends SparkSpec {
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Long, Double)]): (Long, Double) = {
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (u2, u2.toDouble / (pos.size.toDouble * neg.size.toDouble * 2.0))
  }

  test("rocAuc == brute-force pair count with half-credit ties; " +
    "partitioning- and order-invariant") {
    val rnd = new scala.util.Random(7)
    // quantized scores force plenty of exact ties
    val rows = (0 until 400).map { _ =>
      val y = if (rnd.nextBoolean()) 1L else 0L
      val s = (rnd.nextInt(20) + (if (y == 1L) 3 else 0))
        .min(20).toDouble / 20.0
      (y, s)
    }
    val (u2Ref, aucRef) = bruteAuc(rows)
    val df = rows.toDF("label", "score")
    val r = ClassifierEval.rocAuc(df, "label", "score").collect()(0)
    assert(r.getLong(0) == rows.count(_._1 == 1L))
    assert(r.getLong(1) == rows.count(_._1 == 0L))
    assert(r.getLong(2) == u2Ref)
    assert(r.getDouble(3) == aucRef)
    val r2 = ClassifierEval.rocAuc(
      df.orderBy($"score".desc).repartition(7), "label", "score")
      .collect()(0)
    assert(r2.getLong(2) == u2Ref && r2.getDouble(3) == aucRef)
  }

  test("rocAuc extremes: perfect separation 1.0, inverted 0.0, " +
    "all-tied 0.5") {
    val perfect = Seq((1L, 0.9), (1L, 0.8), (0L, 0.2), (0L, 0.1))
      .toDF("label", "score")
    assert(ClassifierEval.rocAuc(perfect, "label", "score")
      .collect()(0).getDouble(3) == 1.0)
    val inverted = Seq((0L, 0.9), (0L, 0.8), (1L, 0.2), (1L, 0.1))
      .toDF("label", "score")
    assert(ClassifierEval.rocAuc(inverted, "label", "score")
      .collect()(0).getDouble(3) == 0.0)
    val tied = Seq((1L, 0.5), (0L, 0.5), (1L, 0.5), (0L, 0.5))
      .toDF("label", "score")
    assert(ClassifierEval.rocAuc(tied, "label", "score")
      .collect()(0).getDouble(3) == 0.5)
  }

  test("calibrationBins: hand-computed bins, top-edge clamp into the " +
    "last bin, truncating-division confidence, gap arithmetic") {
    val rows = Seq(
      (1L, 0.05), (0L, 0.07), // bin 0: n=2, pos=1
      (1L, 1.0), (1L, 0.95), (0L, 0.91)) // 1.0 clamps into bin 9
      .toDF("label", "score")
    val bins = ClassifierEval.calibrationBins(rows, "label", "score", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(bins.keySet == Set(0L, 9L))
    val (n0, p0, conf0, frac0, gap0) = bins(0L)
    assert(n0 == 2L && p0 == 1L)
    // micros: 50000 + 70000 = 120000; DIV 2 = 60000 -> 0.06
    assert(conf0 == 0.06 && frac0 == 0.5)
    assert(gap0 == math.abs(0.5 - 0.06))
    val (n9, p9, conf9, _, _) = bins(9L)
    assert(n9 == 3L && p9 == 2L)
    // micros: 1000000 + 950000 + 910000 = 2860000; DIV 3 = 953333
    assert(conf9 == 0.953333)
  }

  test("refusals: bad labels, NaN/null/out-of-range scores, " +
    "single-class corpus, bin bounds") {
    val ok = Seq((1L, 0.4), (0L, 0.6)).toDF("label", "score")
    intercept[IllegalArgumentException] {
      ClassifierEval.rocAuc(
        Seq((2L, 0.4), (0L, 0.6)).toDF("label", "score"),
        "label", "score")
    }
    intercept[IllegalArgumentException] {
      ClassifierEval.rocAuc(
        Seq((1L, Double.NaN), (0L, 0.6)).toDF("label", "score"),
        "label", "score")
    }
    intercept[IllegalArgumentException] { // positives only
      ClassifierEval.rocAuc(
        Seq((1L, 0.4), (1L, 0.6)).toDF("label", "score"),
        "label", "score")
    }
    intercept[IllegalArgumentException] { // score outside [0, 1]
      ClassifierEval.calibrationBins(
        Seq((1L, 1.2), (0L, 0.6)).toDF("label", "score"),
        "label", "score", 10)
    }
    intercept[IllegalArgumentException] {
      ClassifierEval.calibrationBins(ok, "label", "score", 1)
    }
    intercept[IllegalArgumentException] {
      ClassifierEval.calibrationBins(ok, "label", "score", 5000)
    }
  }
}
