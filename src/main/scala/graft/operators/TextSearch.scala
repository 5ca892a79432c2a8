package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Keyword retrieval over the document corpus: BM25 ranking (Robertson
  * et al., TREC-3 Okapi weighting; the Lucene-default parameterization
  * k1 = 1.2, b = 0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))).
  *
  * The reference pipeline has no retrieval surface; this is part of the
  * LLM-curation family (SURVEY.md §2 extension): given a probe query,
  * pull the top-k most relevant documents — the primitive behind
  * "find training docs about X" audits and contamination spot checks.
  */
object TextSearch {

  /** BM25 top-k documents for one keyword query.
    *
    * Scale shape (100 TB): TWO narrow corpus scans, ZERO wide shuffles.
    * Pass 1 aggregates corpus stats — N, total token length, and each
    * query term's document frequency — into ONE driver row (bounded:
    * |terms| + 2 values; the driver never sees documents). Pass 2
    * prunes to documents containing at least one query term
    * (`arrays_overlap`, narrow), computes each term's tf directly on
    * the token array in place (no explode — the corpus never shuffles
    * on token), scores row-locally, and ships only per-partition top-k
    * heaps to the driver (TakeOrderedAndProject). The per-row tf scan
    * is linear in |terms|, hence the 64-term cap.
    *
    * Engine-exact score contract (the q87 micro-unit rule — float only
    * inside one rounded step, mirrored verbatim by the DuckDB oracle):
    *   - idf rounds half-up at 6 decimals BEFORE it multiplies anything:
    *     idf = round(ln((N + 1)/(df + 0.5)), 6)
    *   - with k1 = 6/5 and b = 3/4, the tf normalization is a ratio of
    *     exact integer forms scaled by 10·TL (TL = total token length):
    *       num = 10·TL·tf,  den = 10·TL·tf + 3·TL + 9·dl·N
    *     evaluated in doubles with FIXED left association (overflow-free
    *     at any corpus size) — both engines perform the identical IEEE
    *     operation sequence;
    *   - each term's contribution rounds half-up at 6 decimals, the
    *     per-document sum is exact decimal arithmetic, and the final
    *     score is one exact IEEE division of the micro-integer sum.
    *
    * Output: (doc, n_hit, score), the k highest scores, ties broken by
    * ascending doc id. Documents sharing no term with the query never
    * appear (their score is 0 by definition).
    *
    * Eager operator: pass 1 runs at call time (one bounded collect). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    val terms = queryTerms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "bm25TopK: no non-empty query terms")
    require(terms.size <= 64,
      s"bm25TopK: ${terms.size} query terms — the per-row tf scan is " +
        "linear in |terms|; split the query or raise the cap deliberately")
    require(k > 0, s"bm25TopK: k must be positive: $k")

    val base = docs
      .select(col(idCol).as("doc"),
        filter(TextExprs.tokens(lower(col(textCol))), t => t =!= "")
          .as("__toks"))
      .select(col("doc"), col("__toks"),
        size(col("__toks")).cast("long").as("__dl"))

    // pass 1: one global aggregate → one driver row. df counts documents
    // CONTAINING the term (array_contains, narrow) — no tokenized corpus
    // ever leaves the executors.
    val statAggs: Seq[Column] =
      count(lit(1)).cast("long").as("__n") +:
        coalesce(sum(col("__dl")), lit(0L)).as("__tl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__toks"), t), 1L).otherwise(0L))
            .as(s"__df$i")
        }
    val stats = base.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val n = stats.getLong(0)
    val tl = stats.getLong(1)
    require(n > 0, "bm25TopK: empty corpus")
    // idf per term, rounded half-up at 6 decimals here (driver, |terms|
    // values) so the plan multiplies a FIXED literal — the oracle's
    // ROUND(ln(..), 6) lands on the same decimal (q74 rule: sub-ulp ln
    // divergence must not reach a compared value)
    val idf: Seq[Double] = terms.indices.map { i =>
      val df = stats.getLong(2 + i)
      new java.math.BigDecimal(math.log((n + 1).toDouble / (df + 0.5)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    }

    // pass 2: prune → per-term tf in place → row-local score → top-k
    val pruned = base
      .where(arrays_overlap(col("__toks"), array(terms.map(lit): _*)))
      .select(col("doc") +: col("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).cast("long")
            .as(s"__tf$i")
        }: _*)
    // a pruned row has >= 1 token, so den >= 3·TL + 9·N > 0; tf = 0
    // contributes exactly 0.000000 through the same expression
    val contribs: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val num = lit(10.0) * lit(tl.toDouble) * tf
      val den = lit(10.0) * lit(tl.toDouble) * tf +
        lit(3.0) * lit(tl.toDouble) +
        lit(9.0) * col("__dl").cast("double") * lit(n.toDouble)
      round(lit(idf(i)) * (num / den), 6).cast("decimal(18,6)")
    }
    val nHit: Column = terms.indices
      .map(i => when(col(s"__tf$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    pruned
      .select(col("doc"), nHit.as("n_hit"),
        (contribs.reduce(_ + _) * 1000000).cast("long").as("__micro"))
      .select(col("doc"), col("n_hit"),
        (col("__micro").cast("double") / lit(1000000.0)).as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
  }
}
