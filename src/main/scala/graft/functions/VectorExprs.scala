package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, as pure Catalyst
  * higher-order functions (zip_with / aggregate) — codegen-friendly, no UDF.
  *
  * Accumulation is an ordered left fold in double precision so results are
  * bit-deterministic and engine-portable (the DuckDB oracle's
  * list_dot_product folds in the same element order).
  */
object VectorExprs {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Ordered-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native codegen'd single-pass implementation
    * (see [[VectorNative]]; the composed fold here is its spec). */
  def cosine(a: Column, b: Column): Column = VectorNative.cosineSim(a, b)

  /** The composed-HOF cosine (reference implementation for equivalence
    * tests; interpreted per element — do not use on hot paths). */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt when only ranking matters). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic LSH bucket for cosine similarity: sign bits of the dot
    * product against `nPlanes` pseudo-random hyperplanes derived from a
    * seeded hash (no RNG at plan time — plane j, dim i weight is
    * a fixed function of (j, i)). Used to shard ANN search so the
    * brute-force compare only runs within a bucket.
    */
  def simhashPlanes(v: Column, planes: Seq[Seq[Double]]): Column =
    VectorNative.planeBits(v, planes)

  /** Composed-HOF plane bits (reference implementation for tests). */
  def simhashPlanesComposed(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val w = array(p.map(lit): _*)
      when(aggregate(zip_with(d(v), w, (x, y) => x * y), lit(0.0), (a, x) => a + x) >= 0, lit("1"))
        .otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
