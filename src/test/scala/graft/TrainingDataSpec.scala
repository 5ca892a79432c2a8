package graft

import graft.operators.TrainingData
import org.apache.spark.sql.functions._

/** Corpus-prep operator invariants beyond the oracle checks. */
class TrainingDataSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  test("deterministic sample: stable, subset-monotonic in permille") {
    val s200 = TrainingData.deterministicSample(docs, "doc_id", 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s500 = TrainingData.deterministicSample(docs, "doc_id", 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = TrainingData.deterministicSample(docs, "doc_id", 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s200 == again)            // reproducible
    assert(s200.subsetOf(s500))      // growing the rate only adds rows
    val n = docs.count().toDouble
    assert(math.abs(s200.size / n - 0.2) < 0.1, s"${s200.size} of $n")
    assert(TrainingData.deterministicSample(docs, "doc_id", 0).count() == 0)
    assert(TrainingData.deterministicSample(docs, "doc_id", 1000).count() == n)
  }

  test("stratified sample: per-stratum rates, subset of the flat sample") {
    val strat = TrainingData.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0), defaultPermille = 300)
    assert(strat.where(col("lang") === "en").count() == 0) // rate 0 excludes
    val flat = TrainingData.deterministicSample(docs, "doc_id", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = strat.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(flat)) // same hash key — strata nest inside the flat rate
    intercept[IllegalArgumentException] {
      TrainingData.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 2000), 100)
    }
  }

  test("sequence packing: bins contiguous per shard, filled to budget") {
    val budget = 1024
    val packed = TrainingData.packSequences(docs, "lang", "doc_id", "text", budget)
    val perBin = packed.groupBy(col("lang"), col("bin"))
      .agg(sum(col("n_tokens")).as("toks"), max(col("n_tokens")).as("mx"))
      .collect()
    perBin.foreach { r =>
      // a bin exceeds the budget by at most its own last doc (greedy cut)
      assert(r.getAs[Long]("toks") < budget + r.getAs[Int]("mx"),
        s"${r.getAs[String]("lang")}/${r.getAs[Long]("bin")}")
    }
    // bins are contiguous 0..max per shard
    val bins = packed.groupBy("lang")
      .agg(countDistinct("bin").as("n"), max("bin").as("mx")).collect()
    bins.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("mx") + 1))
  }

  test("pii redaction leaves no matchable spans and counts what it removed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii").toFile
    dir.deleteOnExit()
    Seq(
      (1L, "mail a.b+c@x-y.example.org and 12 monkeys on 2024-01-02"),
      (2L, "no pii here at all"),
      (3L, "two addrs: a@b.co c@d.io"))
      .toDF("id", "text").write.mode("overwrite").parquet(dir.getAbsolutePath)
    val red = TrainingData.redactPii(spark.read.parquet(dir.getAbsolutePath), "text")
    val rows = red.orderBy("id").collect()
    assert(red.where(col("redacted").rlike(TrainingData.EmailPattern)).count() == 0)
    assert(red.where(col("redacted").rlike(TrainingData.NumberPattern)).count() == 0)
    assert(rows.map(_.getAs[Int]("n_emails")).toSeq == Seq(1, 0, 2))
    assert(rows(0).getAs[Int]("n_numbers") == 4) // 12, 2024, 01, 02
    assert(rows(0).getAs[String]("redacted") ==
      "mail <EMAIL> and <NUM> monkeys on <NUM>-<NUM>-<NUM>")
  }

  test("vocabulary: descending counts, lexicographic ties, k rows max") {
    val v = TrainingData.vocabulary(docs, "text", 10).collect()
    assert(v.length <= 10)
    val pairs = v.map(r => (r.getAs[Long]("n"), r.getAs[String]("token")))
    val sorted = pairs.sortBy { case (n, t) => (-n, t) }.toSeq
    assert(pairs.toSeq == sorted)
  }
}
