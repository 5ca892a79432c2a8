package graft

import graft.operators.HybridSearch
import org.apache.spark.sql.functions._

/** RRF fusion arithmetic pinned by hand, self-exclusion exactness of the
  * hybrid path, and the native top-k plan shape. */
class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private def micro(ranks: Seq[Int], k0: Int = 60): Double = {
    val s = ranks.map { r =>
      BigDecimal(1.0 / (k0 + r)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    ((s * 1000000).toBigInt.toDouble) / 1000000.0
  }

  test("rrfFuse: hand-computed fused scores, overlap summed, " +
    "single-list candidates kept, ties broken by ascending n_id") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("q_id", "n_id", "rank")
    val sem = Seq((1L, 11L, 1), (1L, 12L, 2), (2L, 21L, 1))
      .toDF("q_id", "n_id", "rank")
    val got = HybridSearch.rrfFuse(Seq(lex, sem), kTop = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    // q1: 11 appears rank2(lex)+rank1(sem) -> 1/62+1/61 beats 10 (1/61)
    // and 12 (1/62); 10 vs 12 tie on score? 1/61 vs 1/62 differ.
    val want = Seq(
      (1L, 1, 11L, micro(Seq(2, 1))),
      (1L, 2, 10L, micro(Seq(1))),
      (1L, 3, 12L, micro(Seq(2))),
      (2L, 1, 20L, micro(Seq(1))),
      (2L, 2, 21L, micro(Seq(1))))
      // 20 vs 21 tie at 1/61: ascending n_id breaks it
    assert(got == want)
  }

  test("rrfFuse: equal fused scores rank by ascending n_id (exact " +
    "decimal equality, not float luck)") {
    val a = Seq((7L, 100L, 3), (7L, 50L, 3)).toDF("q_id", "n_id", "rank")
    val got = HybridSearch.rrfFuse(Seq(a), kTop = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((1, 50L), (2, 100L)))
  }

  test("rrfFuse refuses empty list set, non-positive kTop, negative k0") {
    val l = Seq((1L, 2L, 1)).toDF("q_id", "n_id", "rank")
    intercept[IllegalArgumentException] {
      HybridSearch.rrfFuse(Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      HybridSearch.rrfFuse(Seq(l), 0)
    }
    intercept[IllegalArgumentException] {
      HybridSearch.rrfFuse(Seq(l), 1, k0 = -1)
    }
  }

  test("rrfFuse plans the native TopKPerKeyExec reduction (bounded heaps, " +
    "no Window over the fused frame)") {
    // a GraftExtensions session carries the strategy; a plain test
    // session gets it the same way TopK.perKey self-installs it
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(graft.plans.TopKStrategy))
        exp.extraStrategies = exp.extraStrategies :+ graft.plans.TopKStrategy
    }
    val l = (1L to 40L).map(i => (i % 4, i, (i / 4).toInt + 1))
      .toDF("q_id", "n_id", "rank")
    val plan = HybridSearch.rrfFuse(Seq(l), kTop = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("hybridTopK: self doc excluded from BOTH lists, and the lexical " +
    "cut is the exact top-kEach among non-self docs") {
    // corpus where doc 0 is the strongest lexical match for its own
    // probe (its text repeats the term) AND its own nearest embedding —
    // the self row would head both lists if not excluded.
    val docs = Seq(
      (0L, "alpha alpha alpha alpha"),
      (1L, "alpha alpha beta"),
      (2L, "alpha beta beta"),
      (3L, "beta beta beta"),
      (4L, "alpha gamma")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.8f, 0.2f))).toDF("vec_id", "embedding")
    val probes = Seq((0L, Seq("alpha"), Array(1.0f, 0.0f)))
      .toDF("probe", "terms", "pvec")
    val got = HybridSearch.hybridTopK(docs, "doc_id", "text",
        emb, "vec_id", "embedding", probes, "probe", "terms", "pvec",
        kTop = 4, kEach = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(!got.exists(_._2 == 0L), s"self doc leaked: $got")
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    // lexical non-self order: 1 (2 hits, shorter... bm25), semantic
    // non-self order: 1, 4, 2, 3. Candidate 1 leads both lists -> rank 1.
    assert(got.head == (1, 1L))
  }

  test("hybridTopK refuses kEach < kTop") {
    val d = Seq((0L, "x")).toDF("doc_id", "text")
    val e = Seq((0L, Array(1.0f))).toDF("vec_id", "embedding")
    val p = Seq((0L, Seq("x"), Array(1.0f))).toDF("probe", "terms", "pvec")
    intercept[IllegalArgumentException] {
      HybridSearch.hybridTopK(d, "doc_id", "text", e, "vec_id",
        "embedding", p, "probe", "terms", "pvec", kTop = 5, kEach = 4)
    }
  }

  test("hybridTopK fused output is row-order/partitioning independent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = Seq(
        (0L, Seq("spark", "data")), (1L, Seq("table", "join")))
      .toDF("probe", "terms")
      .join(emb.select(col("vec_id").as("probe"),
        col("embedding").as("pvec")), Seq("probe"))
    def run(d: org.apache.spark.sql.DataFrame,
            e: org.apache.spark.sql.DataFrame) =
      HybridSearch.hybridTopK(d, "doc_id", "text", e, "vec_id",
          "embedding", probes, "probe", "terms", "pvec",
          kTop = 5, kEach = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
    val a = run(docs, emb)
    val b = run(docs.repartition(7), emb.repartition(5))
    assert(a == b)
    assert(a.nonEmpty)
  }
}
