package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join must return exactly the rows of the plain join, and spread
  * a hot key across salt partitions. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on skewed data") {
    // 90% of probe rows share key 1 (the classic default-key skew)
    val probe = (1 to 1000).map(i => (if (i <= 900) 1 else i % 50, s"row$i"))
      .toDF("k", "payload")
    val build = (0 until 50).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = probe.join(build, Seq("k")).select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), factor = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 1000) // every probe row matched exactly one dim row
  }

  test("AQE splits a skewed sort-merge partition (runtime skew path gated)") {
    // adversarial distribution: one key owns ~95% of the probe side.
    // With test-scaled skew thresholds, AQE must detect the oversized
    // shuffle partition and split it — the runtime complement to the
    // explicit salting operator above.
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val pad = "x" * 64
      val probe = (1 to 20000)
        .map(i => (if (i <= 19000) 1 else i % 500, s"p$i$pad"))
        .toDF("k", "payload")
      val build = (0 until 500).map(k => (k, s"dim$k")).toDF("k", "attr")
      val joined = probe.join(build, Seq("k"))
      assert(joined.collect().length == 20000) // executes THIS plan via AQE
      def skewJoins(p: org.apache.spark.sql.execution.SparkPlan): Seq[Boolean] =
        p.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            Seq(j.isSkewJoin)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            skewJoins(q.plan)
        }.flatten
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val flags = skewJoins(finalPlan)
      assert(flags.nonEmpty, finalPlan.toString.take(800))
      assert(flags.contains(true), // the skewed partition WAS split
        finalPlan.toString.take(800))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot key actually spreads across salts") {
    val probe = (1 to 1000).map(i => (1, s"row$i")).toDF("k", "payload")
    val salts = probe.withColumn("__salt", pmod(hash(probe.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts >= 6) // near-uniform over 8 buckets
  }
}
