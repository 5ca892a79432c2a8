package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Lloyd's k-means: deterministic seeding, argmin tie-break to the lowest
  * cluster id, convergence toward well-separated groups, empty-cluster
  * drop-out, and exact repeatability across runs. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight blobs far apart on dim 0 plus their ids. */
  private def blobs = Seq(
    (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.05f, 0.05f)),
    (10L, Array(9.9f, 0.1f)), (11L, Array(10.0f, 0.0f)), (12L, Array(10.1f, 0.05f)))
    .toDF("vec_id", "embedding")

  test("k=2 on two separated blobs lands each blob in one cluster") {
    val out = KMeans.assign(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds are ids 0 and 1 (both in the left blob), but one update pass
    // pulls a centroid to the right blob's mean
    assert(Set(out(0L), out(1L), out(2L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(0L) != out(10L))
  }

  test("assignment is exactly repeatable (no RNG, order-proof means)") {
    val a = KMeans.assign(blobs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = KMeans.assign(blobs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("equidistant vector breaks the tie to the lowest cluster id") {
    // seeds at 0.0 and 2.0 on dim0; the 1.0 point is equidistant
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(2.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.assign(df, "vec_id", "embedding", k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 0L)
  }

  test("empty clusters drop out of the update without error") {
    // k=3 but only two distinct points: one seed never wins a vector
    // after its members migrate — the update simply omits it
    val df = Seq(
      (0L, Array(0.0f)), (1L, Array(0.001f)), (2L, Array(5.0f)),
      (3L, Array(5.001f)), (4L, Array(5.002f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.assign(df, "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 5)
    assert(out(2L) == out(3L) && out(3L) == out(4L))
    assert(out(0L) != out(2L))
  }

  test("k or iters below 1 is rejected") {
    intercept[IllegalArgumentException] {
      KMeans.assign(blobs, "vec_id", "embedding", k = 0, iters = 2)
    }
    intercept[IllegalArgumentException] {
      KMeans.assign(blobs, "vec_id", "embedding", k = 2, iters = 0)
    }
  }
}
