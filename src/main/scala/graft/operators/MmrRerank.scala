package graft.operators

import graft.functions.{MmrNative, VectorNative}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MMR diversification of a retrieval run (SIGIR 1998 — see
  * [[graft.functions.MmrNative]]): re-order each query's top-k
  * candidates so every next pick trades relevance against similarity
  * to what is already picked — the standard redundancy-removal tail of
  * a RAG retrieval stack ([[TextSearch]] / [[Similarity]] /
  * [[HybridSearch]] produce the run, this diversifies it).
  *
  * Scale shape (100 TB): the run is list-sized (≤ |queries|×k rows);
  * the embedding join is id-keyed and narrow (normalized vectors
  * attach to candidates, the corpus never re-shuffles), one hash
  * aggregate folds each query's candidates into ONE row, and the
  * inherently-sequential greedy loop runs inside the codegen'd
  * `mmr_select` kernel per query row — parallel across queries, no
  * driver loop, no iterative Spark jobs. */
object MmrRerank {

  /** Diversify `run` (columns q_id, rank, n_id, `relCol` — any
    * higher-is-better relevance, e.g. cos/rrf/score). `emb` supplies
    * candidate vectors by id; vectors are L2-normalized here.
    * Candidates are fed to the kernel in ascending original rank, so
    * score ties resolve to the better original rank and λ = 1 returns
    * the run's top `kOut` EXACTLY (the oracle identity; spec-gated
    * diversity at λ < 1). Output: (q_id, rank, n_id, rel) in pick
    * order, rank 1..min(kOut, |candidates|).
    *
    * Every candidate must resolve in `emb` — the searcher drew its
    * candidates from the same corpus, so a missing id means the caller
    * joined the wrong table. Checked per row inside the plan (a LEFT
    * join whose null vectors raise loudly) — zero extra Spark jobs,
    * the q47 guard-cost lesson. */
  def diversify(run: DataFrame, emb: DataFrame, idCol: String,
                vecCol: String, relCol: String, lambda: Double,
                kOut: Int): DataFrame = {
    require(kOut > 0, s"MmrRerank: kOut must be positive: $kOut")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"MmrRerank: lambda must be in [0, 1]: $lambda")
    val slim = run.select(col("q_id"), col("rank").cast("int").as("rank"),
      col("n_id"), col(relCol).cast("double").as("__rel"))
    val nv = emb.select(col(idCol).as("n_id"),
      VectorNative.l2Normalize(col(vecCol).cast("array<double>"))
        .as("__nv"))
    val cand = slim.join(nv, Seq("n_id"), "left")
    val grouped = cand.groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("rank"), col("n_id"),
        col("__rel"), col("__nv")))).as("__cands"))
    val vecsChecked = transform(col("__cands"), c =>
      when(c.getField("__nv").isNull,
        raise_error(concat(lit("MmrRerank: run candidate n_id="),
          c.getField("n_id").cast("string"),
          lit(" has no embedding — run and emb must describe the same corpus"))))
        .otherwise(c.getField("__nv")))
    val sel = MmrNative.mmrSelect(
      transform(col("__cands"), c => c.getField("__rel")),
      vecsChecked,
      lambda, kOut)
    grouped
      .select(col("q_id"), col("__cands"), posexplode(sel))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        element_at(col("__cands"), col("col") + 1).getField("n_id")
          .as("n_id"),
        element_at(col("__cands"), col("col") + 1).getField("__rel")
          .as("rel"))
  }
}
