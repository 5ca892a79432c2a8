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

  test("native plane bits == composed plane bits") {
    val planes = Similarity.planes(8, 64)
    val diff = emb.select(
      VectorExprs.simhashPlanes(col("embedding"), planes).as("fast"),
      VectorExprs.simhashPlanesComposed(col("embedding"), planes).as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }
}
