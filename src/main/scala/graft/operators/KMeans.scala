package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd's k-means over an `array<float>` embedding column —
  * the semantic-clustering primitive a training-data pipeline uses for
  * corpus bucketing, diversity sampling, and cluster-aware dedup.
  *
  * Spark-first shape: every heavy step is a narrow scan or a hash
  * aggregate over (cluster, dim) cells; centroids (k × dim doubles) are
  * the ONLY driver-side state, re-broadcast per iteration inside a native
  * codegen'd argmin expression ([[graft.functions.VectorNative.nearestCentroid]]).
  * At 100 TB the per-iteration cost is one pass over the vectors plus a
  * k×dim-cell aggregate — no shuffle of the vectors themselves, no
  * cartesian vs centroids (the scan evaluates all k distances in-place).
  *
  * Determinism (and DuckDB-oracle parity):
  *  - init = embeddings of the k lowest ids (no RNG);
  *  - centroid update sums each dimension as DECIMAL(38,16) — exact, so
  *    the distributed accumulation order cannot skew the mean — then
  *    rounds the double mean to 9 dp before the next assignment pass;
  *  - assignment is squared-L2 argmin with ties to the lowest cluster id
  *    (strict `<` scan in ascending id order), matching an oracle
  *    `arg_min(cid, [d, cid])`.
  *
  * Empty clusters simply drop out of the update aggregate (their id never
  * reappears), mirroring what the SQL reconstruction does.
  */
object KMeans {

  /** Final (id, cluster) assignment after `iters` assignment passes with
    * `iters - 1` centroid updates in between. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k and iters=$iters must be positive")
    val spark = emb.sparkSession
    // The driver fixture is a single row group -> one scan task; the
    // per-row argmin over k centroids is the dominant compute, so spread
    // it (Tables.splitOnRead story). Snapshot once: every iteration
    // re-reads this frame, and re-running the scan+cast lineage per pass
    // would multiply the fixed cost by iters.
    val e = emb
      .select(col(idCol).cast(LongType).as("__id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("__v"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()

    // Deterministic seeds: vectors of the k lowest ids, cluster id = rank.
    var centroids: Array[(Long, Array[Double])] =
      e.orderBy(col("__id")).limit(k).collect().zipWithIndex.map {
        case (r, i) => (i.toLong, r.getSeq[Double](1).toArray)
      }

    def assignOnce(cents: Array[(Long, Array[Double])]): DataFrame = {
      // nearestCentroid returns the POSITION in the centroid array;
      // positions map back to surviving cluster ids (ascending, so the
      // lowest-position tie-break is the lowest-cluster-id tie-break).
      val ids = cents.map(_._1)
      val pos = graft.functions.VectorNative
        .nearestCentroid(col("__v"), cents.map(_._2).toSeq)
      e.withColumn("cluster",
        element_at(typedlit(ids.toSeq), pos + 1))
    }

    var it = 1
    while (it < iters) {
      val assigned = assignOnce(centroids)
      // (cluster, dim)-cell aggregate: exact decimal sum -> order-proof
      // mean; k*dim cells collect to the driver (tiny), vectors never move.
      val cells = assigned
        .select(col("cluster"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy(col("cluster"), col("__pos"))
        .agg(sum(col("__x").cast(DecimalType(38, 16))).as("__s"),
          count(lit(1)).as("__n"))
        .select(col("cluster"), col("__pos"),
          round(col("__s").cast(DoubleType) / col("__n"), 9).as("__m"))
        .collect()
      centroids = cells.groupBy(_.getLong(0)).toArray.sortBy(_._1).map {
        case (cid, rows) =>
          val dim = rows.length
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          (cid, v)
      }
      it += 1
    }
    assignOnce(centroids).select(col("__id").as(idCol), col("cluster"))
  }
}
