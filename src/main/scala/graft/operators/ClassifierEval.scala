package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation for binary scorers (the [[QualityClassifier]] family):
  * exact ROC-AUC and reliability (calibration) bins. A quality
  * classifier gates what enters a 100 TB training corpus — before its
  * threshold is trusted, its ranking (AUC) and its probability
  * calibration (reliability curve / ECE inputs) need to be measured
  * on held-out labels, and at corpus scale the standard
  * sort-all-rows rank formulation is the wrong shape.
  *
  * Exactness protocol: AUC is computed from the per-distinct-score
  * label histogram in INTEGER arithmetic — `u2` is twice the
  * Mann-Whitney U statistic (ties count half, so doubling keeps it a
  * long), an exact sum of products of counts; the only float is the
  * final IEEE division. No float accumulates across rows, so the
  * result is partitioning-invariant and a SQL oracle replays it
  * hash-exact.
  *
  * Scale shape (100 TB): ONE corpus scan into a score-keyed
  * HashAggregate (map-side combine — the exchange carries ≤ distinct
  * scores per partition, never rows). The cumulative pass then runs
  * on the HISTOGRAM, whose size is loudly bounded: scores from the
  * integer-micros classifier protocol take ≤ 1,000,001 distinct
  * values, so the unpartitioned window is a bounded-small single
  * task, not a corpus sort. Free-float scorers with corpus-sized
  * distinct score sets are refused (quantize first — micros are the
  * repo's score contract). */
object ClassifierEval {

  /** Hard cap on the score histogram (2²²): far above the micros
    * protocol's 1,000,001 but small enough that the cumulative window
    * stays a single bounded task. */
  val MaxDistinctScores: Long = 1L << 22

  private def validated(scored: DataFrame, labelCol: String,
                        scoreCol: String): DataFrame = {
    val s = scored.select(col(scoreCol).cast("double").as("score"),
      col(labelCol).cast("long").as("y"))
    val bad = s.where(col("y").isNull || !col("y").isin(0L, 1L) ||
      col("score").isNull || col("score").isNaN).limit(1).count()
    require(bad == 0L,
      s"ClassifierEval: labels must be 0/1 and scores non-null finite " +
        s"($labelCol / $scoreCol)")
    s
  }

  /** Exact ROC-AUC: one row (n_pos, n_neg, u2, auc) where `u2` =
    * 2·Σ_s pos(s)·(2·neg_below(s) + neg(s)) / 2 — i.e. twice the tie-
    * aware Mann-Whitney U, an exact long — and auc = u2 / (2·P·N). */
  def rocAuc(scored: DataFrame, labelCol: String, scoreCol: String)
  : DataFrame = {
    val s = validated(scored, labelCol, scoreCol)
    // ONE corpus-scanning aggregate; everything after runs on the
    // bounded histogram (localCheckpoint: the guard action and the
    // final pass must not re-scan the corpus)
    val h = s.groupBy(col("score"))
      .agg(sum(col("y")).as("p"), sum(lit(1L) - col("y")).as("q"))
      .localCheckpoint()
    val stats = h.agg(count(lit(1)).as("d"), sum(col("p")).as("pp"),
      sum(col("q")).as("nn")).collect()(0)
    require(stats.getLong(0) <= MaxDistinctScores,
      s"ClassifierEval.rocAuc: ${stats.getLong(0)} distinct scores " +
        s"exceed $MaxDistinctScores — quantize the scorer (the " +
        "integer-micros protocol) before ranking the corpus by it")
    require(stats.getLong(1) > 0L && stats.getLong(2) > 0L,
      "ClassifierEval.rocAuc: AUC needs both classes present " +
        s"(pos=${stats.getLong(1)}, neg=${stats.getLong(2)})")
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("__nb", coalesce(sum(col("q")).over(w), lit(0L)))
      .agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("__nb") + col("q"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (col("n_pos").cast("double") * col("n_neg").cast("double")
            * lit(2.0))).as("auc"))
  }

  /** Reliability bins over scores in [0, 1]: per occupied bin
    * (bin, n, n_pos, avg_conf, frac_pos, gap). Confidence averages
    * stay exact: scores reconstruct to integer micros
    * (floor(score·10⁶ + ½) — the inverse of the micros protocol's
    * final division), sum as longs, and average by truncating
    * division; `gap` = |frac_pos − avg_conf| is the per-bin ECE
    * contribution (weight by n/N to aggregate). Empty bins are
    * absent, not zero-filled. ONE scan into a ≤`bins`-key
    * HashAggregate. */
  def calibrationBins(scored: DataFrame, labelCol: String,
                      scoreCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 4096,
      s"ClassifierEval: bins must be in [2, 4096]: $bins")
    val s = validated(scored, labelCol, scoreCol)
    val oob = s.where(col("score") < 0.0 || col("score") > 1.0)
      .limit(1).count()
    require(oob == 0L,
      "ClassifierEval.calibrationBins: scores must lie in [0, 1]")
    val binned = s.select(
      least(lit(bins - 1L), floor(col("score") * bins).cast("long"))
        .as("bin"),
      col("y"),
      floor(col("score") * 1000000.0 + 0.5).cast("long").as("__sm"))
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("__sm")).as("__smsum"))
      .select(col("bin"), col("n"), col("n_pos"),
        (expr("__smsum DIV n").cast("double") / lit(1000000.0))
          .as("avg_conf"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("frac_pos"))
      .withColumn("gap", abs(col("frac_pos") - col("avg_conf")))
  }
}
