package graft.operators

import graft.functions.VectorNative
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k-means centroids partition the corpus;
  * a query probes only the `nProbe` nearest centroid cells.
  *
  * The centroid "training" is a deterministic k-means (fixed seed,
  * fixed-order init from the first k vectors, a few Lloyd iterations
  * driver-side over a sample — centroid count is tiny, the corpus
  * assignment is the distributed part). At 100 TB the assignment pass is
  * one narrow scan producing (cell, id) — the index — and a search is
  * nProbe cell-scans instead of a full-corpus scan: recall/latency
  * tunable via (k, nProbe).
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]])

  /** Deterministic k-means over a driver-collected sample (sampleSize
    * rows, first-k init, `iters` Lloyd rounds). The sample is bounded and
    * the result broadcast — no large-state driver loop at scale. */
  def train(corpus: DataFrame, vecCol: String, k: Int,
            sampleSize: Int = 2000, iters: Int = 8): Model = {
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"need >= $k sample vectors")
    var cent = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](cent(0).length))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(cent, v)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      cent = cent.indices.map { c =>
        if (counts(c) == 0) cent(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    Model(cent)
  }

  private def nearest(cent: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cent.length) {
      var d = 0.0
      var i = 0
      val w = cent(c)
      while (i < v.length) { val t = v(i) - w(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Assignment pass: (id, vec, cell) — the inverted file. One narrow
    * codegen'd scan (native argmin expression); at scale this is what you
    * persist, partitioned by cell. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorNative.nearestCentroid(col(vecCol), model.centroids.toSeq).as("cell"))

  /** Search: probe the nProbe nearest cells per query, exact cosine
    * within the probed cells only.
    *
    * Probe selection is a narrow distributed pass — the native
    * `nearest_cells` expression emits each query's top-nProbe cell ids in
    * the scan and `explode` turns them into (q_id, q_vec, cell) probe
    * rows, so the query side never touches the driver and can itself be a
    * full table. The broadcast hint fits the "query batch ≪ corpus"
    * contract; with a corpus-sized query table Catalyst/AQE would plan
    * the cell join as a shuffle join instead — drop the hint then. */
  def search(index: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             model: Model, k: Int, nProbe: Int): DataFrame = {
    val probes = queries.select(
      col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      explode(VectorNative.nearestCells(col(vecCol), model.centroids.toSeq, nProbe))
        .as("cell"))
    val cand = index.join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos", VectorNative.cosineSim(col("q_vec"), col("n_vec")))
    Similarity.topKRank(cand, k)
  }
}
