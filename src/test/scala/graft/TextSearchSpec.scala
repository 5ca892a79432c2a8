package graft

import org.apache.spark.sql.functions._

import graft.operators.TextSearch

/** BM25 top-k retrieval: the engine-exact score contract (idf rounded
  * half-up at 6 decimals pre-multiply, 10·TL-scaled tf ratio with fixed
  * left association, micro-unit contribution sum) against hand-computed
  * values, tie/caps semantics, and the no-explode/no-shuffle plan shape
  * the 100 TB design claims. */
class TextSearchSpec extends SparkSpec {

  import spark.implicits._

  // N=4, TL=10; idf(apple)=idf(cherry)=round(ln(5/2.5),6)=0.693147.
  // den = 10·TL·tf + 3·TL + 9·dl·N = 100·tf + 30 + 36·dl.
  private def corpus = Seq(
    (1L, "Apple banana APPLE"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry apple"),
    (4L, "durian")
  ).toDF("doc_id", "text")

  test("multi-term scores match the hand-computed micro-unit contract") {
    val got = TextSearch.bm25TopK(corpus, "doc_id", "text",
        Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc1: apple tf=2 -> round(.693147*200/338,6)=.410146; cherry tf=0
    // doc2: cherry tf=1 -> round(.693147*100/202,6)=.343142
    // doc3: apple 100/274 + cherry 300/474 -> .252984+.438690=.691674
    // doc4: shares no term -> absent
    assert(got.toSeq === Seq(
      (3L, 2L, 0.691674), (1L, 1L, 0.410146), (2L, 1L, 0.343142)))
  }

  test("case-insensitive query terms, duplicates and blanks dropped") {
    val got = TextSearch.bm25TopK(corpus, "doc_id", "text",
        Seq(" APPLE ", "apple", "", "Cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.toSeq === Seq((3L, 0.691674), (1L, 0.410146), (2L, 0.343142)))
  }

  test("score ties break by ascending doc id and k cuts inside the tie") {
    val dup = Seq(
      (10L, "alpha beta"), (7L, "alpha beta"), (9L, "alpha beta"),
      (8L, "gamma")
    ).toDF("doc_id", "text")
    val got = TextSearch.bm25TopK(dup, "doc_id", "text", Seq("alpha"), k = 2)
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(7L, 9L))
  }

  test("a term absent from the corpus contributes exactly zero") {
    val got = TextSearch.bm25TopK(corpus, "doc_id", "text",
        Seq("apple", "cherry", "zzz_absent"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // idf(zzz)=round(ln(5/0.5),6) but tf=0 everywhere -> contribution
    // 0.000000, n_hit unchanged, same scores as the two-term query.
    assert(got.toSeq === Seq(
      (3L, 2L, 0.691674), (1L, 1L, 0.410146), (2L, 1L, 0.343142)))
  }

  test("caps: empty terms, >64 terms, non-positive k all refuse") {
    intercept[IllegalArgumentException] {
      TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("  ", ""), k = 5)
    }
    intercept[IllegalArgumentException] {
      TextSearch.bm25TopK(corpus, "doc_id", "text",
        (1 to 65).map(i => s"t$i"), k = 5)
    }
    intercept[IllegalArgumentException] {
      TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("apple"), k = 0)
    }
  }

  test("plan gate: no token explode, no exchange, TakeOrderedAndProject on top") {
    // a real parquet scan — a local fixture constant-folds to a
    // LocalRelation and the planner loses the top-k rewrite. Raw read,
    // not Tables.documents: that helper injects a round-robin
    // repartition (local-parallelism fan-out), which would mask the
    // operator's own zero-exchange claim.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = TextSearch.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "vector", "join"), k = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k on top:\n$plan")
    // the corpus never shuffles: tf is computed on the token array in
    // place (no Generate/explode), and pass 2 has no wide operator
    assert(!plan.contains("Generate"), s"token explode leaked in:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
