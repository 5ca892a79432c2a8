package graft

import graft.functions.VectorExprs
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native vector expressions must be bit-identical to the composed
  * higher-order-function formulations on real embedding data. */
class VectorNativeSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("native cosine == composed cosine, bit-for-bit") {
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .where(col("a") < col("b") && col("a") < 30 && col("b") < 30)
    val diff = pairs.select(
      VectorExprs.cosine(col("va"), col("vb")).as("fast"),
      VectorExprs.cosineComposed(col("va"), col("vb")).as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("NaN query vectors are rejected, not silently mapped to centroid 0") {
    import graft.functions.VectorNative
    import spark.implicits._
    val cents = Seq(Array(0.0, 0.0), Array(1.0, 1.0))
    val bad = Seq((1L, Seq(Double.NaN, 0.5))).toDF("id", "vec")
    val e = intercept[Exception] {
      bad.select(VectorNative.nearestCells($"vec", cents, 2)).collect()
    }
    assert(e.getMessage.contains("NaN"))
    val e2 = intercept[Exception] {
      bad.select(VectorNative.nearestCentroid($"vec", cents)).collect()
    }
    assert(e2.getMessage.contains("NaN"))
  }

  test("native plane bits == composed plane bits") {
    val planes = Similarity.planes(8, 64)
    val diff = emb.select(
      VectorExprs.simhashPlanes(col("embedding"), planes).as("fast"),
      VectorExprs.simhashPlanesComposed(col("embedding"), planes).as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }
}
