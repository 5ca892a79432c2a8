package graft.operators

import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, "Reciprocal Rank Fusion outperforms
  * Condorcet and individual Rank Learning Methods", SIGIR 2009 — public
  * literature): each ranked list contributes `1 / (k0 + rank)` per
  * candidate and the fused score is the sum — rank-only fusion, so BM25
  * scores and cosine similarities never need calibrating onto one
  * scale. This is the standard production shape for RAG retrieval
  * (keyword recall + embedding recall, one fused top-k).
  *
  * Scale shape (100 TB): fusion runs on the ALREADY-REDUCED top-k
  * lists — ≤ |queries|×kEach rows per list — never on corpora. The
  * expensive parts are the upstream searches, which keep their own
  * scale contracts ([[TextSearch.bm25TopKBatch]]: constant job count,
  * posting-intersection shuffle volume; [[Similarity.bruteTopK]] or an
  * IVF/PQ searcher: candidate-bound). The fused aggregate is one hash
  * aggregate keyed (q_id, n_id) over list-sized input, and the final
  * per-query top-k routes through the native [[graft.plans.TopKPerKeyExec]]
  * bounded heaps when installed.
  *
  * Score contract (the q87 micro-unit rule, mirrored verbatim by the
  * DuckDB oracle): each list contribution rounds half-up at 6 decimals
  * BEFORE summing (`round(1/(k0+rank), 6)` as decimal(18,6)), the
  * per-candidate sum is exact decimal arithmetic, and the final score
  * is one exact IEEE division of the micro-integer sum — both engines
  * add identical decimals, so cross-engine float drift cannot reach a
  * compared value. */
object HybridSearch {

  /** Fuse ranked lists by RRF. Every input frame must carry
    * (`q_id`, `n_id`, `rank`) with rank ≥ 1 (row_number semantics —
    * exactly what [[Similarity.topKRank]]-shaped outputs provide).
    * A candidate absent from a list simply contributes nothing (the
    * RRF paper's convention). Output: (q_id, rank, n_id, rrf), the
    * kTop highest fused scores per query, ties broken by ascending
    * n_id. */
  def rrfFuse(lists: Seq[DataFrame], kTop: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no ranked lists")
    require(kTop > 0, s"rrfFuse: kTop must be positive: $kTop")
    require(k0 >= 0, s"rrfFuse: k0 must be non-negative: $k0")
    val contribs = lists.map(_.select(col("q_id"), col("n_id"),
      round(lit(1.0) / (lit(k0).cast("double") + col("rank").cast("double")), 6)
        .cast("decimal(18,6)").as("__ct")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("__ct")).as("__s"))
      .select(col("q_id"), col("n_id"),
        ((col("__s") * 1000000).cast("long").cast("double") /
          lit(1000000.0)).as("__rrf"))
    rankFused(fused, kTop)
  }

  /** One-call hybrid top-k over a corpus that carries both text and an
    * embedding: BM25 the probe terms, cosine-search the probe vectors,
    * RRF-fuse. `probes` carries `probeIdCol` (ids in the SAME namespace
    * as the corpus ids — a probe is typically a corpus document),
    * `termsCol: array<string>`, and `probeVecCol`. Both candidate lists
    * exclude the probe's own document (`n_id = q_id`): the semantic
    * side by [[Similarity.bruteTopK]]'s self-pair rule, the lexical
    * side by over-fetching kEach+1 and dropping self — removing at most
    * one row from the top-(kEach+1) leaves exactly the top kEach among
    * non-self docs, so the exclusion is exact, not a truncation.
    *
    * `docs` and `emb` may be the same frame or two tables keyed by the
    * same id (the documents/embeddings split) — only (id, text) and
    * (id, vec) columns are read from each. */
  def hybridTopK(docs: DataFrame, docIdCol: String, textCol: String,
                 emb: DataFrame, embIdCol: String, vecCol: String,
                 probes: DataFrame, probeIdCol: String, termsCol: String,
                 probeVecCol: String, kTop: Int, kEach: Int,
                 k0: Int = 60): DataFrame = {
    require(kEach >= kTop,
      s"hybridTopK: kEach $kEach < kTop $kTop — each list must be at " +
        "least as deep as the fused cut")
    val lex = TextSearch.bm25TopKBatch(docs, docIdCol, textCol,
        probes, probeIdCol, termsCol, kEach + 1)
      .where(col("doc") =!= col("probe"))
    // re-rank after the self drop: bounded input (≤ probes×(kEach+1)
    // rows — list-sized, so the single-partition-per-probe window is
    // the documented small-frame shape, not a corpus shuffle)
    val wl = Window.partitionBy(col("probe"))
      .orderBy(col("score").desc, col("doc"))
    val lexRanked = lex.withColumn("rank", row_number().over(wl))
      .where(col("rank") <= kEach)
      .select(col("probe").as("q_id"), col("doc").as("n_id"), col("rank"))
    val sem = Similarity.bruteTopK(emb,
        probes.select(col(probeIdCol).as(embIdCol),
          col(probeVecCol).as(vecCol)),
        embIdCol, vecCol, kEach)
      .select(col("q_id"), col("n_id"), col("rank"))
    rrfFuse(Seq(lexRanked, sem), kTop, k0)
  }

  /** Per-query top-k of the fused frame — [[Similarity.topKRank]]'s
    * routing contract (native bounded heaps when the strategy is
    * installed, window fallback; identical output by construction). */
  private def rankFused(fused: DataFrame, kTop: Int): DataFrame = {
    val native = fused.sparkSession.sessionState.planner.strategies
      .contains(graft.plans.TopKStrategy)
    val ranked =
      if (native)
        TopK.perKey(fused, Seq("q_id"),
          Seq(TopK.Sort("__rrf", desc = true), TopK.Sort("n_id")), kTop)
      else {
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("__rrf").desc, col("n_id"))
        fused.withColumn("rank", row_number().over(w))
          .where(col("rank") <= kTop)
      }
    ranked.select(col("q_id"), col("rank"), col("n_id"),
      col("__rrf").as("rrf"))
  }
}
