package graft.operators

import graft.functions.VectorNative
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas,
  * Tirumala, Simig, Ganguli & Morcos, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication",
  * arXiv:2303.09540 — public literature): cluster the embedding space
  * with k-means, then inside each cluster drop every example whose
  * cosine similarity to a KEPT example reaches `tau`. Where MinHash
  * catches lexical near-copies, this catches semantic ones — the same
  * paragraph paraphrased, boilerplate re-worded per site — which is
  * why web-scale training-data pipelines run both.
  *
  * Relation to [[Similarity.semanticDedup]] (the LSH-bucketed
  * dominance dedup): that operator drops a row iff ANY smaller-id
  * vector corpus-wide is `tau`-similar — global semantics, recall
  * bounded by the hyperplane buckets. This one is the paper's
  * cluster-CONFINED contract: candidates are only compared inside
  * their k-means cell (a deliberate approximation that buys bounded
  * quadratic work), the keeper is chosen by centroid-distance (cluster
  * edges survive, preserving diversity), and within a cell the verify
  * is exhaustive, not bucket-limited.
  *
  * Keeper rule (the paper's): within a duplicate group, keep the
  * example with the LOWEST cosine similarity to its cluster centroid —
  * survivors sit at cluster edges, preserving diversity. Made exact
  * and order-free here as a greedy dominance rule: order each cluster
  * by (centroid-cosine asc, id asc); an example is DROPPED iff some
  * earlier example in that order is `tau`-similar to it. One
  * deterministic pass, no iteration — survivors are exactly the greedy
  * prefix-scan's picks.
  *
  * Scale shape (100 TB): the quadratic verify is confined inside
  * clusters — one shuffle keyed on cell, candidate volume Σ|cell|²
  * instead of |corpus|² (the paper runs ~50k clusters over 5B
  * embeddings for this reason; pick k ≈ corpus/10⁴ so cells stay
  * partition-sized). Vectors are L2-normalized ONCE at the scan, the
  * cell-keyed self-join ships (id, nv, cell, csim) only — never the
  * original rows — and survivors rejoin the input by id (id-keyed,
  * narrow). Centroids are bounded literals inside codegen'd native
  * expressions ([[graft.functions.VectorNative]]), so assignment and
  * centroid-cosine are one narrow scan with no join against a
  * centroid table. */
object SemDeDup {

  /** Deduplicate `emb` against itself: returns the SURVIVING input rows
    * (all original columns, original values). `model` supplies the
    * cluster centroids ([[IvfIndex.train]]'s output or any fixed
    * centroid set — centroids are L2-normalized here, so on unit
    * vectors nearest-by-L2 is nearest-by-cosine); `tau` is the cosine
    * threshold at or above which two same-cluster examples are
    * duplicates. Vectors must be non-null, non-empty, and
    * dimension-consistent with the model (the native kernels fail
    * loudly per row otherwise — same contract as the ANN family). */
  def dedup(emb: DataFrame, idCol: String, vecCol: String,
                    model: IvfIndex.Model, tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0,
      s"SemDeDup: tau must be in (0, 1]: $tau")
    val cents: Seq[Array[Double]] = model.centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      require(n > 0.0, "SemDeDup: zero-vector centroid")
      c.map(_ / n)
    }.toSeq
    val nv = VectorNative.l2Normalize(col(vecCol).cast("array<double>"))
    val cell = VectorNative.nearestCentroid(nv, cents)
    // centroid-cosine via a when-chain on the already-computed cell:
    // one dot per row (the matched branch), not k — the argmin already
    // paid the k-dot scan.
    val csim: Column = cents.zipWithIndex.tail
      .foldLeft(when(col("__cell") === 0,
        VectorNative.dotProduct(col("__nv"), typedlit(cents.head.toSeq)))) {
        case (acc, (c, i)) => acc.when(col("__cell") === i,
          VectorNative.dotProduct(col("__nv"), typedlit(c.toSeq)))
      }
    val slim = emb
      .select(col(idCol).as("__sd_id"), nv.as("__nv"), cell.as("__cell"))
      .withColumn("__csim", csim)
    // greedy dominance: drop a iff an earlier-ordered same-cell b is
    // tau-similar. Cell equality keys the join; the order predicate and
    // the cosine threshold ride as join filters inside the cell.
    val b = slim.select(col("__sd_id").as("__b_id"), col("__nv").as("__b_nv"),
      col("__cell").as("__b_cell"), col("__csim").as("__b_csim"))
    val survivors = slim.join(b,
        col("__b_cell") === col("__cell") &&
          (col("__b_csim") < col("__csim") ||
            (col("__b_csim") === col("__csim") &&
              col("__b_id") < col("__sd_id"))) &&
          VectorNative.dotProduct(col("__nv"), col("__b_nv")) >= lit(tau),
        "left_anti")
      .select(col("__sd_id"))
    emb.join(survivors, emb(idCol) === col("__sd_id"), "left_semi")
  }

  /** Train-and-dedup convenience: k-means the corpus with
    * [[IvfIndex.train]]'s deterministic protocol (id-hash-ordered
    * sample, first-k init, fixed Lloyd rounds), then
    * [[dedup]]. */
  def dedupTrained(emb: DataFrame, idCol: String, vecCol: String,
                           k: Int, tau: Double, sampleSize: Int = 2000,
                           iters: Int = 8): DataFrame =
    dedup(emb, idCol, vecCol,
      IvfIndex.train(emb, idCol, vecCol, k, sampleSize, iters), tau)
}
