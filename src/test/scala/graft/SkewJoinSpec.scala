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

  test("hot key actually spreads across salts") {
    val probe = (1 to 1000).map(i => (1, s"row$i")).toDF("k", "payload")
    val salts = probe.withColumn("__salt", pmod(hash(probe.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts >= 6) // near-uniform over 8 buckets
  }
}
