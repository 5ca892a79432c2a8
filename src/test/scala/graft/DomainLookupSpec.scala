package graft

import org.apache.spark.sql.functions._

import graft.operators.{DomainLookup, TrainingData}
import graft.functions.StableId63
import org.apache.spark.unsafe.types.UTF8String

/** The chain/broadcast-lookup duality behind every per-domain attribute
  * (round-9 verdict #3): value-identical results at both plan shapes,
  * the join shape adds no exchange on the corpus side, the default picks
  * the join above the threshold, and the chain at exactly the threshold
  * still compiles under whole-stage codegen (no interpreted fallback). */
class DomainLookupSpec extends SparkSpec {

  import spark.implicits._

  private def withChainMax[A](v: String)(f: => A): A = {
    spark.conf.set(DomainLookup.ChainMaxConf, v)
    try f finally spark.conf.unset(DomainLookup.ChainMaxConf)
  }

  /** Run `build` under both forced shapes and assert identical results
    * (sorted row sets, schema-aligned). */
  private def assertShapesAgree(build: => org.apache.spark.sql.DataFrame,
                                minRows: Int = 1): Unit = {
    val chain = withChainMax(Int.MaxValue.toString) {
      build.collect().map(_.toSeq).sortBy(_.mkString("|")) }
    val join = withChainMax("0") {
      build.collect().map(_.toSeq).sortBy(_.mkString("|")) }
    assert(chain.length >= minRows, s"degenerate fixture: ${chain.length} rows")
    assert(chain.toSeq === join.toSeq)
  }

  private lazy val docs =
    Tables.documents(spark, "/root/testdata/sf0.001").limit(300)

  test("stratifiedSample: chain and broadcast shapes are value-identical") {
    assertShapesAgree(TrainingData.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 500, "de" -> 100), 1000))
  }

  test("mixToQuotas: chain and broadcast shapes are value-identical") {
    assertShapesAgree(TrainingData.mixToQuotas(
      docs, "doc_id", "source", Map("src13" -> 8L, "src8" -> 10000L)))
  }

  test("mixByTemperature: chain and broadcast shapes are value-identical") {
    assertShapesAgree(TrainingData.mixByTemperature(
      docs, "doc_id", "source", temperature = 2.0, targetDocs = 120))
  }

  test("upsampleToQuota: chain and broadcast shapes are value-identical") {
    assertShapesAgree(TrainingData.upsampleToQuota(
      docs, "doc_id", "source", Map("src13" -> 60L, "src8" -> 5L)))
  }

  test("mixToQuotasExact: chain and broadcast shapes are value-identical") {
    assertShapesAgree(TrainingData.mixToQuotasExact(
      docs, "doc_id", "source", Map("src13" -> 9L, "src8" -> 4L)))
  }

  test("selectToTokenBudget: chain and broadcast shapes are value-identical") {
    assertShapesAgree(TrainingData.selectToTokenBudget(
      docs, "source", "doc_id", "text", "n_chars", budget = 2000L))
  }

  test("perplexityBuckets: chain and broadcast shapes are value-identical") {
    val lm = TrainingData.trainQualityLm(docs.limit(100), "text", vocabSize = 50)
    assertShapesAgree(TrainingData.perplexityBuckets(
      docs, "doc_id", "text", "source", lm))
  }

  test("join shape: broadcast lookup, zero corpus-side exchanges") {
    val df = withChainMax("0") {
      val out = TrainingData.stratifiedSample(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "lang", Map("en" -> 500), 1000)
      out.collect()
      out
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast lookup:\n$plan")
    assert(!plan.contains("ShuffleExchange") &&
      !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"corpus-side shuffle leaked in:\n$plan")
  }

  test("chain shape: no join at hand-written spec sizes (default conf)") {
    val out = TrainingData.stratifiedSample(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "lang", Map("en" -> 500), 1000)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join below threshold:\n$plan")
  }

  test("10k domains: default picks the broadcast shape and matches a " +
      "driver-computed oracle") {
    // 20k rows over 10k strata — the cardinality where a literal chain is
    // a codegen bomb. The oracle recomputes each row's keep decision from
    // the same documented key contract (63-bit md5 key mod 1000 < rate).
    val n = 20000
    val rows = (0 until n).map(i => (i.toLong, s"dom${i % 10000}"))
    val df = rows.toDF("id", "dom")
      // a real scan so ConvertToLocalRelation can't fold the lookup away
      .repartition(4)
    val rates = (0 until 10000).map(d => s"dom$d" -> (d % 1001)).toMap
    val out = TrainingData.stratifiedSample(df, "id", "dom", rates, 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"10k domains must take the lookup join:\n$plan")
    val got = out.collect().map(_.getLong(0)).sorted
    val want = rows.filter { case (id, dom) =>
      StableId63.hash(UTF8String.fromString(id.toString)) % 1000 < rates(dom)
    }.map(_._1).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("duplicate domain keys refuse loudly (shape-divergence guard)") {
    // the when-chain would keep the LAST entry while the broadcast join
    // would DUPLICATE corpus rows — shape-exchangeability breaks, so
    // attach refuses rather than resolving (advice r10)
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "dom")
    val e = intercept[IllegalArgumentException] {
      DomainLookup.attach(df, col("dom"), StringType,
        Seq(("a", Seq(1)), ("b", Seq(2)), ("a", Seq(3))),
        Seq(("attr", IntegerType)))
    }
    assert(e.getMessage.contains("duplicate domain keys"))
  }

  test("lookup rows past MaxRows refuse loudly (broadcast-envelope guard)") {
    // past Spark's broadcast hard limit the join shape would silently
    // become a sort-merge join, breaking every caller's no-shuffle
    // contract — so the bound is a require, not a comment (verdict r10 #8)
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val df = Seq((1L, "a")).toDF("id", "dom")
    // a Seq.fill(16M) would be slow; a lightweight view with a lying size
    // exercises the require without materializing 16M tuples
    val big = new scala.collection.immutable.IndexedSeq[(Any, Seq[Any])] {
      override def length: Int = DomainLookup.MaxRows + 1
      override def apply(i: Int): (Any, Seq[Any]) = (s"d$i", Seq(i))
    }
    val e = intercept[IllegalArgumentException] {
      DomainLookup.attach(df, col("dom"), StringType, big,
        Seq(("attr", IntegerType)))
    }
    assert(e.getMessage.contains("MaxRows"))
  }

  test("chain at exactly the threshold compiles under whole-stage codegen") {
    // 128 domains = DefaultChainMax: the largest chain the default emits.
    // With fallback disabled, an interpreted regression fails loudly.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rates = (0 until DomainLookup.DefaultChainMax)
        .map(d => s"lang$d" -> 500).toMap
      val out = TrainingData.stratifiedSample(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .withColumn("lang",
            concat(lit("lang"), pmod(col("doc_id"), lit(200)))),
        "doc_id", "lang", rates, 1000)
      // the *(n) markers print instead of the node name — check the tree
      assert(out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.nonEmpty)
      assert(out.count() > 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
